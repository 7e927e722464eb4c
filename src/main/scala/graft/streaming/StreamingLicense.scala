package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.license.{FilterExpr, Licensing, RecordCols}

/** Streaming license tagging — span-tag semantics over a record stream.
  *
  * Expression-only configs (source/collection/ISSN/subject predicates)
  * run on a stream unchanged: [[Licensing.tag]] with no holdings refs
  * is a stateless projection (StreamingSpec proves it). Configs that
  * reference KBART holdings do NOT: the one-pass holdings attachment is
  * an explode → broadcast join → groupBy → join-back, and that
  * aggregation + self-join is illegal in a streaming append plan.
  *
  * The production pattern for exactly this shape is `foreachBatch`:
  * each micro-batch is a bounded DataFrame, so the full batch operator
  * runs verbatim per batch — identical semantics, bounded state (the
  * holdings tables are static; no cross-batch record state exists
  * because tagging is per-record). Exactly-once lands on the sink's
  * idempotence: file sinks get one directory write per (batchId),
  * retried batches overwrite deterministically.
  */
object StreamingLicense {

  /** Tag each micro-batch with the full batch operator and hand the
    * result to `sink` (e.g. an idempotent partitioned write). Returns
    * the started query. The default trigger drains what's available
    * and stops (the batch-parity / catch-up shape); pass e.g.
    * `Trigger.ProcessingTime("1 minute")` for a continuous feed. */
  def start(records: DataFrame, r: RecordCols,
            configs: Map[String, FilterExpr],
            holdings: Map[String, DataFrame],
            asOf: String,
            checkpoint: String,
            dropUnlabeled: Boolean = false,
            trigger: Trigger = Trigger.AvailableNow())(
            sink: (DataFrame, Long) => Unit): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(Licensing.tag(batch, r, configs, holdings, asOf,
          dropUnlabeled = dropUnlabeled), batchId)
      }
      .start()
}
