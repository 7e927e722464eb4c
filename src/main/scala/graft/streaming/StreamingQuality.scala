package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.llm.LmStore

/** Streaming CCNet quality scoring — score a document stream against
  * the PERSISTED reference LM ([[graft.llm.LmStore]]).
  *
  * The scoring plan is almost stream-legal (broadcast model joins are
  * fine in an append plan), but two pieces are not: the zero-bigram
  * attach is a union + re-aggregate over the batch, and the model must
  * be re-read — and params-verified — from a store that a concurrent
  * reference harvest may [[LmStore.append]] to. So the production
  * shape is the [[StreamingLicense]] one: `foreachBatch`, where each
  * micro-batch is a bounded DataFrame and the full batch operator runs
  * verbatim, with the model read once per batch — a mid-run append or
  * takedown surfaces at the next batch boundary, never mid-batch (the
  * store's directory-swap promotion means a batch reads either the old
  * model or the new one, never a mix). Exactly-once lands on the
  * sink's idempotence, as everywhere in this package.
  */
object StreamingQuality {

  /** Score each micro-batch against the store and hand the scored
    * frame (id[, lang], n_bigrams, lp_sum_e6) to `sink`. The default
    * trigger drains what's available and stops (the batch-parity /
    * catch-up shape); pass e.g. `Trigger.ProcessingTime("1 minute")`
    * for a continuous feed. */
  def start(docs: DataFrame, id: String, text: String,
            storeDir: String, params: LmStore.Params,
            checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow())(
            sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(LmStore.score(batch.sparkSession, storeDir, params,
          batch, id, text), batchId)
      }
      .start()
}
