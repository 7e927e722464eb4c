package graft.llm

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BPE tokenizer artifacts — the [[ArtifactStore]] contract
  * applied to [[TextAnalysis.bpeTrainFull]]'s output: production
  * pipelines train a tokenizer ONCE and serve its merge table and
  * segmentation for months (every token budget, every packing run,
  * every decontamination window measures against the same vocabulary);
  * they do not re-train per batch — exactly the [[LmStore]] argument,
  * applied to the tokenizer. Serving against segments from one
  * training run under another run's merge table silently changes every
  * token count downstream, so every write drops a `_params.json`
  * sidecar and every read verifies it plus cross-table structural
  * facts and refuses loudly on drift.
  *
  * Layout under `dir` (layout 2, stamped in the sidecar): one
  * `model/` directory holding the `_params.json` sidecar (inside the
  * swap unit, so parameters and tables promote atomically and can
  * never be torn apart by a crash mid-retrain), `merges/` (rank,
  * left, right, merged, pair_count) — the ranked merge rules, THE
  * tokenizer artifact proper — and `segments/` (w, c, s) — the
  * trained vocabulary's final segmentation, which is what the bounded
  * serve join reads (a word outside it falls back to character
  * segmentation, the untrained-word cost).
  *
  * Artifacts OUTLIVE the code that wrote them: layout 1 (the previous
  * scheme — same tables, sidecar at the store ROOT instead of inside
  * `model/`) stays readable forever via the [[readParams]] fallback,
  * and the first retrain migrates it (the promoted `model/` carries
  * its own sidecar; the stale root copy is then dropped). A deploy
  * must never brick a persisted tokenizer — retraining the vocabulary
  * because the store code was upgraded would silently shift every
  * token count downstream.
  *
  * Unlike the LM's count tables, a tokenizer artifact has NO
  * incremental append/subtract: merge ranks are global order
  * statistics of the whole reference corpus, so reference growth means
  * retrain-and-swap ([[build]] over an existing store promotes the
  * replacement with the crash-safe unique-temp swap; readers are never
  * exposed to a torn model). All filesystem access goes through the
  * Hadoop FileSystem API so the artifact can live on HDFS/object
  * storage.
  */
object TokenizerStore {

  /** The model fingerprint: merge-round budget and the training
    * min-frequency floor. */
  case class Params(merges: Int, minCount: Long) {
    require(merges >= 1 && merges <= TextAnalysis.BpeMaxMerges,
      s"TokenizerStore.Params: merges must be in " +
        s"[1, ${TextAnalysis.BpeMaxMerges}], got $merges")
    def render: String = s"""{"merges":$merges,"minCount":$minCount}"""
  }

  private val Sidecar = ArtifactStore.Sidecar
  private val ModelDir = "model"
  private val Components = Seq("merges", "segments")

  private def fs(spark: SparkSession, dir: String): FileSystem =
    ArtifactStore.fs(spark, dir)

  /** Train on `refDocs` and persist with the sidecar. Over an existing
    * store this is the retrain path: the replacement model is fully
    * written to a unique temp and promoted by the crash-safe swap. */
  def build(refDocs: DataFrame, id: String, text: String, dir: String,
            params: Params): Unit = {
    val (m, w) = TextAnalysis.bpeTrainFull(refDocs, id, text,
      params.merges, params.minCount)
    write(m, w, dir, params)
  }

  /** Persist an already-trained (merge table, segmentation) pair with
    * the sidecar. The caller asserts both came from ONE
    * [[TextAnalysis.bpeTrainFull]] run under `params`.
    *
    * The sidecar lives INSIDE `model/` and is written into the temp
    * BEFORE the tables, so the `model/` rename promotes parameters and
    * tables as one unit: a crash can never pair a new model with an
    * old sidecar (which, when the new merge count ≤ the old `merges`
    * bound, would pass every [[read]] check and serve silently wrong
    * token counts — the exact drift this store exists to refuse).
    *
    * The FIRST write takes the same temp + verify + rename path as a
    * retrain: building directly in the live `model/` would let a crash
    * leave a valid sidecar next to torn tables (a truncated merge tail
    * still satisfies the contiguity check), which [[read]] could not
    * distinguish from a healthy model. With the swap discipline a
    * crash leaves either no `model/` (loud refusal) or a complete one,
    * never a torn one. */
  def write(merges: DataFrame, segments: DataFrame, dir: String,
            params: Params): Unit = {
    val spark = merges.sparkSession
    val f = fs(spark, dir)
    recoverSwap(f, dir)
    ArtifactStore.cleanStaleTmps(f, dir, ModelDir)
    val tmp = ArtifactStore.newTmpPath(dir, ModelDir)
    writeModel(f, merges, segments, tmp, params)
    ArtifactStore.commitSwap(f, dir, ModelDir, tmp, Components,
      "TokenizerStore", "write")
    // Layout-1 migration completes here: the freshly promoted model/
    // carries its own sidecar, so a root-level copy left by the
    // previous layout is stale — drop it so readParams can never pair
    // the new model with the old parameters.
    f.delete(new Path(dir, Sidecar), false)
  }

  private def writeModel(f: FileSystem, merges: DataFrame,
                         segments: DataFrame, root: Path,
                         params: Params): Unit = {
    // Sidecar first: a temp missing its tables has no _SUCCESS markers
    // and is never promoted, so every PROMOTABLE build carries its own
    // parameters.
    f.mkdirs(root)
    // `layout` stamps the directory scheme (2 = sidecar inside
    // model/), so the NEXT layout evolution is explicit instead of
    // inferred from file positions; parameter equality ignores it.
    ArtifactStore.writeSidecar(f, new Path(root, Sidecar),
      ArtifactStore.withLayout(params.render, 2))
    merges.write.mode("overwrite").parquet(s"$root/merges")
    segments.write.mode("overwrite").parquet(s"$root/segments")
  }

  /** The verified artifact as (merges, segments). Structural drift
    * guards beyond the sidecar match: merge ranks must be exactly
    * 1..n with n ≤ `params.merges` and positive pair counts (an
    * out-of-band edit that drops or duplicates a rank reorders every
    * tokenization), and every multi-code-point segment symbol other
    * than the bare `</w>` marker must be a `merged` value of the merge
    * table — a segmentation paired with another run's merge table (the
    * franken-model) fails here loudly instead of serving silently
    * wrong token counts. */
  def read(spark: SparkSession, dir: String, params: Params)
      : (DataFrame, DataFrame) = {
    val f = fs(spark, dir)
    recoverSwap(f, dir)
    requireParams(spark, dir, params, "read")
    // Torn-component refusal before the structural checks — a
    // truncated merge tail still passes the contiguity check below.
    ArtifactStore.requireCommitted(f, dir, ModelDir, Components,
      "TokenizerStore")
    val merges = spark.read.parquet(s"$dir/$ModelDir/merges")
    val segments = spark.read.parquet(s"$dir/$ModelDir/segments")
    val m = merges.agg(count(lit(1)), coalesce(min("rank"), lit(1)),
      coalesce(max("rank"), lit(0)),
      coalesce(min("pair_count"), lit(1L)),
      countDistinct(col("rank"))).head()
    val n = m.getLong(0)
    // count + min + max alone accept a duplicated rank masking a gap
    // (e.g. {1,2,2,4}); countDistinct == count closes that hole.
    require(n <= params.merges &&
        (n == 0L || (m.getInt(1) == 1 && m.getInt(2).toLong == n &&
          m.getLong(4) == n)),
      s"TokenizerStore.read: merge table at $dir has $n rows with " +
        s"ranks ${m.getInt(1)}..${m.getInt(2)} " +
        s"(${m.getLong(4)} distinct) — not the contiguous " +
        s"1..n ≤ ${params.merges} a training run writes; the artifact " +
        "was edited out-of-band")
    require(m.getLong(3) >= 1L,
      s"TokenizerStore.read: non-positive pair_count at $dir — the " +
        "artifact was edited out-of-band")
    val orphans = segments
      .select(explode(col("s")).as("sym")).distinct()
      .filter(length(col("sym")) > 1 && col("sym") =!= "</w>")
      .join(merges.select(col("merged").as("sym")).distinct(),
        Seq("sym"), "left_anti")
      .limit(1).count()
    require(orphans == 0L,
      s"TokenizerStore.read: segments at $dir contain merged symbols " +
        "absent from the merge table — the components come from " +
        "different training runs (serving this franken-model would " +
        "silently change every token count)")
    (merges, segments)
  }

  /** Per-doc token counts served from the persisted artifact
    * (read-verified) — the nightly path: training is paid once by
    * [[build]], this is one broadcast join per batch. */
  def tokenCounts(spark: SparkSession, dir: String, params: Params,
                  docs: DataFrame, id: String, text: String): DataFrame =
    TextAnalysis.bpeTokenCountsWith(docs, id, text,
      read(spark, dir, params)._2)

  /** Per-symbol token-id stream served from the persisted artifact
    * (read-verified) — the actual model-input encoding; ids are a
    * pure function of the stored segmentation (binary-ordered dense
    * ranks), so re-serving from the same artifact always re-derives
    * the same id table. */
  def tokenIds(spark: SparkSession, dir: String, params: Params,
               docs: DataFrame, id: String, text: String,
               withIndex: Boolean = false,
               carry: Seq[String] = Nil): DataFrame =
    TextAnalysis.bpeTokenIdsWith(docs, id, text,
      read(spark, dir, params)._2, withIndex, carry)

  /** Complete an interrupted [[write]] swap — the shared
    * [[ArtifactStore.recoverSwap]] discipline on the `model/` unit.
    * Idempotent; called by every entry point. */
  private def recoverSwap(f: FileSystem, dir: String): Unit =
    ArtifactStore.recoverSwap(f, dir, ModelDir, Components,
      "TokenizerStore")

  /** The stored parameters, or None when no artifact exists. Read from
    * `model/$Sidecar` — the sidecar is part of the swapped unit, so
    * these are always the parameters of the CURRENTLY LIVE model.
    * Falls back to the store ROOT, where layout 1 (every artifact
    * written before the sidecar moved inside the swap unit) kept it:
    * a persisted tokenizer must stay readable across code deploys. */
  def readParams(spark: SparkSession, dir: String): Option[Params] = {
    val f = fs(spark, dir)
    recoverSwap(f, dir)
    ArtifactStore.readSidecarText(f, s"$dir/$ModelDir")
      .orElse(ArtifactStore.readSidecarText(f, dir))
      .map { text =>
        Params(ArtifactStore.intField(text, "merges", "TokenizerStore", dir),
          ArtifactStore.longField(text, "minCount", "TokenizerStore", dir))
      }
  }

  private def requireParams(spark: SparkSession, dir: String,
                            expected: Params, op: String): Unit =
    readParams(spark, dir) match {
      case None =>
        throw new IllegalStateException(
          s"TokenizerStore.$op: no $Sidecar sidecar at $dir — refusing " +
            "to tokenize against a model whose training parameters are " +
            "unknown (a mismatch yields silently wrong token counts)")
      case Some(stored) if stored != expected =>
        throw new IllegalStateException(
          s"TokenizerStore.$op: parameter mismatch at $dir — artifact " +
            s"built with ${stored.render}, caller expects " +
            s"${expected.render}; tokenizing across models yields " +
            "silently wrong token counts")
      case _ => ()
    }
}
