package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
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
  * overwrites its own `batch=<id>` subdir — a retried batch replaces
  * itself, never duplicating membership), and pairs are materialized
  * BEFORE the batch joins the store, so a batch never pairs against
  * itself through the corpus side.
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
            sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val session = batch.sparkSession
        val batchDocs = batch.select(col(id), col(text)).localCheckpoint()
        // Only batches strictly BEFORE this one: foreachBatch is
        // at-least-once, so a crash between the corpus write below and
        // the stream commit replays this batchId — an unfiltered read
        // would then see the batch's own docs on the corpus side and
        // emit self-pairs for every replayed doc.
        val corpus = readCorpus(session, corpusDir, batchDocs.schema, batchId)
        // Materialized eagerly: the sink must see the pre-append pair
        // set even if it evaluates lazily after the corpus write below.
        val pairs = Dedup.minhashLshPairsIncremental(corpus, batchDocs,
          id, text, threshold, shingleN, bands, rowsPerBand, maxBucketSize)
          .localCheckpoint()
        sink(pairs, batchId)
        batchDocs.write.mode("overwrite")
          .parquet(s"$corpusDir/batch=$batchId")
      }
      .start()

  /** The accumulated store as of (but excluding) `beforeBatch`, or an
    * empty frame with the right schema before the first batch lands. */
  private def readCorpus(spark: SparkSession, dir: String,
                         schema: StructType, beforeBatch: Long): DataFrame = {
    val parts = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch=") &&
        f.getName.stripPrefix("batch=").toLong < beforeBatch)
      .map(_.toString)
    if (parts.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.schema(schema).parquet(parts: _*)
  }
}
