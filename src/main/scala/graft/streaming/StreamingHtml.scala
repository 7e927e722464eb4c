package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming HTML→text main-content extraction — the crawl front door
  * ([[graft.plans.HtmlText]]) on a page stream.
  *
  * The extraction itself is a pure scan projection (stream-legal as
  * an append plan), but the production shape stays `foreachBatch`
  * like every other operator in this package: a crawl feed's next
  * stage (the funnel, dedup staging, store appends) needs the bounded
  * batch DataFrame anyway, and running the BATCH operator verbatim
  * per micro-batch is what makes the parity gate (StreamingSpec:
  * stream ≡ batch column-for-column) a real guarantee rather than a
  * separate streaming implementation to trust. Exactly-once lands on
  * the sink's idempotence, as everywhere in this package. */
object StreamingHtml {

  /** Extract each micro-batch's pages and hand the extracted frame
    * (passthrough columns + text, n_lines_kept, n_lines_dropped) to
    * `sink`. `native` selects the fused single-pass expression (the
    * production path) — the declarative twin is spec-pinned equal. */
  def start(pages: DataFrame, html: String, checkpoint: String,
            native: Boolean = true,
            trigger: Trigger = Trigger.AvailableNow())(
            sink: (DataFrame, Long) => Unit): StreamingQuery =
    pages.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.llm.TextAnalysis.htmlExtractStats(batch, html,
          native = native), batchId)
      }
      .start()
}
