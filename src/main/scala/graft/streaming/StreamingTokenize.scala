package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.llm.TokenizerStore

/** Streaming tokenization — per-doc BPE token budgets for a document
  * stream, served from the PERSISTED tokenizer artifact
  * ([[graft.llm.TokenizerStore]]).
  *
  * Completes the streaming-serve symmetry across the four stores
  * (bands → [[StreamingDedup]], LM counts → [[StreamingQuality]],
  * vector index → [[StreamingSearch]], tokenizer → here): the serving
  * join itself is stream-legal (a broadcast word→segment join), but
  * the artifact must be re-read — and params/structure-verified —
  * from a store a concurrent retrain may [[TokenizerStore.write]] to.
  * So the production shape is `foreachBatch` with the store read once
  * per batch: a mid-run vocabulary swap surfaces at the next batch
  * boundary, never mid-batch (the store's one-directory-swap
  * promotion means a batch tokenizes under either the old merge table
  * or the new one, never a mix of the two — a franken-vocabulary
  * would silently change every count). Exactly-once lands on the
  * sink's idempotence, as everywhere in this package.
  */
object StreamingTokenize {

  /** Tokenize each micro-batch from the store and hand the
    * (id, n_bpe_tokens) frame to `sink`. The default trigger drains
    * what's available and stops (the batch-parity / catch-up shape);
    * pass e.g. `Trigger.ProcessingTime("1 minute")` for a continuous
    * feed. */
  def start(docs: DataFrame, id: String, text: String,
            storeDir: String, params: TokenizerStore.Params,
            checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow())(
            sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(TokenizerStore.tokenCounts(batch.sparkSession, storeDir,
          params, batch, id, text), batchId)
      }
      .start()
}
