package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.llm.{BandStore, Dedup}
import graft.Checkpoints.TruncateOps

/** Streaming near-dup detection — the continuous form of the nightly
  * incremental dedup: documents arrive as a stream, each micro-batch
  * is paired against the accumulated corpus with
  * [[Dedup.minhashLshPairsIncremental]] (corpus × corpus is never
  * re-paired), the batch's pairs go to `sink`, and the batch then
  * joins the corpus store itself.
  *
  * Like [[StreamingLicense]], the operator runs under `foreachBatch`:
  * LSH banding needs aggregations and self-joins that are illegal in a
  * streaming append plan, but every micro-batch is a bounded DataFrame
  * so the full batch operator runs verbatim — identical semantics,
  * and the cross-batch state is exactly the corpus store: the (id,
  * text) document dirs (read only to tokenize candidate-pair members)
  * PLUS a parallel `_bands/` store of precomputed (doc, band, bucket)
  * rows appended per batch, passed to the operator as `corpusBands` —
  * the corpus is signed exactly once, when its batch arrives, never
  * re-signed, which is the invariant that makes the stream viable at
  * corpus sizes where the signature pass dominates cost. The `_bands`
  * store carries a [[graft.llm.BandStore]] parameter sidecar; starting
  * a stream with a different hash family against an existing store
  * fails loudly instead of silently matching zero buckets.
  *
  * Exactly-once: the corpus append is idempotent (each batch
  * overwrites its own checkpoint-namespaced `run=<ns>_batch=<id>`
  * subdir — a retried batch replaces itself, never duplicating
  * membership, and a NEW checkpoint over an existing store gets a new
  * namespace, so earlier runs' batches are neither clobbered nor
  * ignored), and pairs are materialized BEFORE the batch joins the
  * store, so a batch never pairs against itself through the corpus
  * side even on replay.
  *
  * Completeness (spec-pinned): streaming any partition of a document
  * set from an empty store yields exactly the full batch run's pair
  * set — a pair's later member is always in some batch, whose run sees
  * the earlier member in the store. Bucket caps are per-batch-run here
  * (membership grows over time), so stream ≡ batch holds capless;
  * capped runs bound work per batch like the nightly job does.
  */
object StreamingDedup {

  def start(docs: DataFrame, id: String, text: String,
            corpusDir: String, checkpoint: String,
            threshold: Double = 0.8, shingleN: Int = 1,
            bands: Int = 16, rowsPerBand: Int = 8,
            maxBucketSize: Option[Int] = None,
            trigger: Trigger = Trigger.AvailableNow())(
            sink: (DataFrame, Long) => Unit): StreamingQuery = {
    // Store subdirs are namespaced by the CHECKPOINT's identity:
    // batchIds are checkpoint-scoped (a fresh checkpoint restarts at
    // 0), so bare batch=N names would both collide with a previous
    // run's dirs (overwriting corpus data) and defeat the replay
    // exclusion below. Same checkpoint → same namespace (replay-safe);
    // a new checkpoint over an existing store gets a new namespace and
    // sees every earlier run's batches as corpus.
    val ns = runNamespace(checkpoint)
    // Fail-fast contract checks BEFORE the stream starts: the hash
    // family must match the band store's sidecar (a mismatch inside
    // foreachBatch would also fail, but only after checkpoint state
    // exists), and every doc-store batch must have its band rows — a
    // crash between the per-batch doc write and band write on a run
    // whose checkpoint was then ABANDONED (new checkpoint started), or
    // a corpus written by a pre-_bands layout, leaves committed docs
    // with no band rows. Since the corpus is never re-signed, those
    // docs would silently never pair again; the guard backfills them
    // by signing each uncovered doc batch once under the store's own
    // hash family. The CURRENT checkpoint's batches are exempt: a doc
    // dir without band rows under a live checkpoint is an uncommitted
    // batch the stream itself is about to replay and overwrite.
    val session = docs.sparkSession
    val bandsRootStart = s"$corpusDir/$BandsSubdir"
    BandStore.ensureParams(session, bandsRootStart,
      BandStore.Params(shingleN, bands, rowsPerBand, portable = false))
    backfillBands(session, corpusDir, docs.select(col(id), col(text)).schema,
      id, text, ns, shingleN, bands, rowsPerBand)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val session = batch.sparkSession
        val batchDocs = batch.select(col(id), col(text)).truncateLineage()
        val bandsRoot = s"$corpusDir/$BandsSubdir"
        BandStore.ensureParams(session, bandsRoot,
          BandStore.Params(shingleN, bands, rowsPerBand, portable = false))
        // Exclude this run's batches >= the current id: foreachBatch is
        // at-least-once, so a crash between the corpus write below and
        // the stream commit replays this batchId — an unfiltered read
        // would then see the batch's own docs on the corpus side and
        // emit self-pairs for every replayed doc. Other runs' batches
        // always count as corpus. Both stores are listed and read
        // through [[CorpusStore]] (Hadoop FileSystem, not java.io.File
        // — they must work on HDFS/object storage, and compacted
        // generations carry row-level provenance for this exclusion).
        val corpus = CorpusStore.readDocs(session, corpusDir,
          batchDocs.schema, Some(ns), batchId)
        // The corpus side's signatures come from the persisted band
        // store under the same replay exclusion — the corpus is never
        // re-signed; its documents are only read to tokenize
        // candidate-pair members inside the verify step.
        val bandSchema = Dedup.minhashBandTable(batchDocs.limit(0), id,
          text, shingleN, bands, rowsPerBand).schema
        val corpusBands = CorpusStore.readDocs(session, bandsRoot,
          bandSchema, Some(ns), batchId)
        // Materialized eagerly: the sink must see the pre-append pair
        // set even if it evaluates lazily after the corpus write below.
        // The releasable variant hands back an unpersist hook for the
        // operator's internal caches — each micro-batch is fresh data,
        // so without it the CacheManager would pin two new datasets per
        // batch for the life of the stream.
        val (incPairs, release) = Dedup.minhashLshPairsIncrementalReleasable(
          corpus, batchDocs, id, text, threshold, shingleN, bands,
          rowsPerBand, maxBucketSize, corpusBands = Some(corpusBands))
        val pairs = try incPairs.truncateLineage() finally release()
        sink(pairs, batchId)
        batchDocs.write.mode("overwrite")
          .parquet(s"$corpusDir/run=${ns}_batch=$batchId")
        // The increment is signed a second time here (it was signed
        // inside the operator for pairing) — bounded by the batch, the
        // price of keeping the operator's signature untouched; the
        // overwrite makes a replayed batch replace its own band rows.
        Dedup.minhashBandTable(batchDocs, id, text, shingleN, bands,
            rowsPerBand)
          .write.mode("overwrite")
          .parquet(s"$bandsRoot/run=${ns}_batch=$batchId")
      }
      .start()
  }

  /** Subdir of the corpus store holding the per-batch band rows (the
    * persisted signature artifact). Underscore-prefixed so a plain
    * `spark.read.parquet(corpusDir)` never mistakes it for data. */
  val BandsSubdir = "_bands"

  /** The doc↔band coverage guard: every (ns, batch) identity in the
    * document store that is NOT the current checkpoint's must have a
    * matching band-store identity; any that does not gets its band
    * rows written here by signing the surviving docs of that batch
    * once (raw dir or compacted provenance — [[CorpusStore.readRun]]).
    * Identity comparison is metadata-only (dir listings + manifests);
    * signing happens only for uncovered batches, so a consistent
    * store pays two listings per stream start. Caller has already
    * verified the band store's parameter sidecar — backfilling under
    * a mismatched family would poison the store, never reach this
    * point. */
  private def backfillBands(spark: org.apache.spark.sql.SparkSession,
                            corpusDir: String,
                            docSchema: org.apache.spark.sql.types.StructType,
                            id: String, text: String, currentNs: String,
                            shingleN: Int, bands: Int,
                            rowsPerBand: Int): Unit = {
    val bandsRoot = s"$corpusDir/$BandsSubdir"
    val docIds = CorpusStore.batchIdentities(spark, corpusDir)
      .filterNot(_._1 == currentNs)
    val bandIds = CorpusStore.batchIdentities(spark, bandsRoot)
    (docIds -- bandIds).toSeq.sorted.foreach { case (mns, mb) =>
      val d = CorpusStore.readRun(spark, corpusDir, docSchema, mns, mb)
      Dedup.minhashBandTable(d, id, text, shingleN, bands, rowsPerBand)
        .write.mode("overwrite")
        .parquet(s"$bandsRoot/run=${mns}_batch=$mb")
    }
  }

  /** Remove `ids` from BOTH halves of the store — documents and band
    * rows — so a takedown leaves the stream's future pair sets
    * identical to a fresh run over the surviving documents. Run it
    * while the stream is stopped (the same maintenance window as
    * [[CorpusStore.compact]]; compaction of the two halves is likewise
    * independent and safe). */
  def deleteDocs(spark: org.apache.spark.sql.SparkSession,
                 corpusDir: String, id: String, ids: DataFrame): Unit = {
    CorpusStore.delete(spark, corpusDir, id, ids)
    CorpusStore.delete(spark, s"$corpusDir/$BandsSubdir", "doc", ids)
  }

  /** The store namespace a checkpoint's batches are written under —
    * the handle for run-granular maintenance ([[expireRun]]). */
  def runNamespace(checkpoint: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
      .take(6).map(b => f"${b & 0xff}%02x").mkString

  /** Run-granular retention for BOTH halves — the
    * [[CorpusStore.expireRuns]] sibling of [[deleteDocs]]: every
    * document a retired stream run (checkpoint namespace) contributed
    * disappears from the document store AND the band store, so future
    * pair sets equal a fresh run over the surviving corpus. Document
    * and band batches share their run namespace by construction
    * (start() writes both under `run=$ns`), which is what makes the
    * symmetric expiry sufficient. Same maintenance window rules as
    * [[deleteDocs]]. */
  def expireRun(spark: org.apache.spark.sql.SparkSession,
                corpusDir: String, id: String, runs: Seq[String]): Unit = {
    CorpusStore.expireRuns(spark, corpusDir, id, runs)
    CorpusStore.expireRuns(spark, s"$corpusDir/$BandsSubdir", "doc", runs)
  }
}
