package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.llm.Dedup

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
  * and the cross-batch state is exactly the corpus store (in
  * production: the persisted band table + token store, bucketed by
  * (band, bucket); here (id, text) parquet for clarity — the operator
  * recomputes corpus signatures per batch at test scale, a deployment
  * reads the precomputed band artifact instead).
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
    val ns = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
      .take(6).map(b => f"${b & 0xff}%02x").mkString
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val session = batch.sparkSession
        val batchDocs = batch.select(col(id), col(text)).localCheckpoint()
        // Exclude this run's batches >= the current id: foreachBatch is
        // at-least-once, so a crash between the corpus write below and
        // the stream commit replays this batchId — an unfiltered read
        // would then see the batch's own docs on the corpus side and
        // emit self-pairs for every replayed doc. Other runs' batches
        // always count as corpus. The store is listed and read through
        // [[CorpusStore]] (Hadoop FileSystem, not java.io.File — the
        // store must work on HDFS/object storage, and compacted
        // generations carry row-level provenance for this exclusion).
        val corpus = CorpusStore.readDocs(session, corpusDir,
          batchDocs.schema, Some(ns), batchId)
        // Materialized eagerly: the sink must see the pre-append pair
        // set even if it evaluates lazily after the corpus write below.
        // The releasable variant hands back an unpersist hook for the
        // operator's internal caches — each micro-batch is fresh data,
        // so without it the CacheManager would pin two new datasets per
        // batch for the life of the stream.
        val (incPairs, release) = Dedup.minhashLshPairsIncrementalReleasable(
          corpus, batchDocs, id, text, threshold, shingleN, bands,
          rowsPerBand, maxBucketSize)
        val pairs = try incPairs.localCheckpoint() finally release()
        sink(pairs, batchId)
        batchDocs.write.mode("overwrite")
          .parquet(s"$corpusDir/run=${ns}_batch=$batchId")
      }
      .start()
  }
}
