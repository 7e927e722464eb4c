package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.llm.IndexStore

/** Streaming ANN serving — search a stream of QUERY vectors against
  * the PERSISTED IVF-PQ index ([[graft.llm.IndexStore]]): the
  * [[StreamingQuality]] shape applied to the vector-index artifact.
  *
  * Same reasoning as the LM store's streaming serve: the search plan
  * itself is batch-shaped (broadcast model tables, a probed-list join,
  * a per-query top-k), and the index must be re-read — and params- and
  * structure-verified — from a store that a concurrent harvest may
  * [[IndexStore.append]] to or a takedown may [[IndexStore.delete]]
  * from. So each micro-batch runs the full batch operator verbatim via
  * `foreachBatch`, reading the index once per batch: maintenance
  * lands at the NEXT batch boundary, never mid-batch (both paths
  * promote a complete replacement with one directory swap, so a batch
  * sees the old inverted lists or the new ones, never a mix — a
  * deleted vector can appear in no batch after the swap, an appended
  * one in every batch after). Exactly-once lands on the sink's
  * idempotence, as everywhere in this package.
  */
object StreamingSearch {

  /** Search each micro-batch of `queries` (qid, vec) against the store
    * and hand the neighbor frame (qid, id, rank, dist) to `sink`.
    * `corpus` is the static raw-vector table the ADC shortlist re-ranks
    * against (raw floats live with the corpus, not in the index) — it
    * must cover every id the index can return, including appended
    * increments. The default trigger drains what's available and stops
    * (the batch-parity / catch-up shape); pass e.g.
    * `Trigger.ProcessingTime("1 minute")` for a continuous feed. */
  def start(queries: DataFrame, qid: String, vec: String,
            storeDir: String, params: IndexStore.Params,
            corpus: DataFrame, k: Int, checkpoint: String,
            nprobe: Int = 2, overscan: Int = 4,
            trigger: Trigger = Trigger.AvailableNow())(
            sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(IndexStore.searchTopKRerank(batch.sparkSession, storeDir,
          params, corpus, batch, qid, vec, k, nprobe, overscan), batchId)
      }
      .start()
}
