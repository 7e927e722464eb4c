package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming WARC ingestion — the crawl-delivery shape: .warc.gz
  * files LAND in a directory (a fetcher drops one per capture batch)
  * and each is split into records exactly once.
  *
  * Structured Streaming's file source does the hard half (exactly-once
  * file discovery via the checkpointed file log — a re-delivered or
  * re-listed file is never re-processed); the record split is the
  * BATCH codec verbatim over each micro-batch's files
  * ([[graft.sources.Warc.recordsOf]] — shared code, so stream and
  * batch cannot drift; StreamingSpec pins them equal). Downstream
  * (html_extract → funnel → stores) composes inside the same
  * foreachBatch, like every pipeline in this package. */
object StreamingWarc {

  /** The binaryFile source's fixed schema — a streaming file source
    * requires it stated (no inference on a stream). */
  private val BinaryFileSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
  }

  /** Watch `dir` for new .warc(.gz) files and hand each micro-batch's
    * parsed records (path, warc_type, target_uri, http_status,
    * content_type, payload) to `sink`. */
  def start(spark: SparkSession, dir: String, checkpoint: String,
            glob: String = "*.warc.gz", gzipped: Boolean = true,
            trigger: Trigger = Trigger.AvailableNow())(
            sink: (DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", glob)
      .load(dir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.sources.Warc.recordsOf(batch, gzipped), batchId)
      }
      .start()
}
