package graft.llm

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted bigram-LM artifacts for the CCNet quality-scoring family
  * — the [[BandStore]]/[[IndexStore]] contract applied to
  * [[Corpus.LmModel]]: production CCNet trains its reference LM ONCE
  * (per language) and scores crawl snapshots against it for months; it
  * does not re-read Wikipedia per nightly batch. This store owns that
  * artifact and enforces its model contract: scoring with a model
  * whose key family (string vs xxhash64) or language partitioning
  * differs from what the scorer assumes joins on the wrong keys and
  * returns plausible-looking garbage scores, so every write drops a
  * `_params.json` sidecar and every read verifies it — plus
  * cross-table structural facts — and refuses loudly on drift.
  *
  * Layout under `dir`: one `model/` directory holding `bigrams/`
  * (lang, bgk, c2), `contexts/` (lang, w1k, c1), `tokens/`
  * (lang, tkk, c). All three are COUNT tables, which is what makes
  * the store maintainable in place:
  *  - [[append]] (reference grows): counts merge by key-wise sum;
  *  - [[subtract]] (reference takedown): counts subtract key-wise,
  *    keys reaching zero disappear — the exact inverse of the append
  *    that added those documents. This is why `tokens` stores
  *    occurrence counts rather than the bare distinct set [[Corpus
  *    .lmScoreWith]] needs (vocabulary = per-lang row count): a set
  *    cannot be subtracted without re-reading the retained reference.
  * Both maintenance paths build a complete replacement model tree and
  * promote it with ONE write–rename–rename–delete swap of `model/`
  * ([[BandStore.delete]]'s discipline, lifted to the whole model
  * because the three tables are only consistent TOGETHER — swapping
  * them one-by-one could strand a crash between two training runs);
  * [[recoverSwap]] completes an interrupted swap on every entry. All
  * filesystem access goes through the Hadoop FileSystem API so the
  * artifact can live on HDFS/object storage.
  */
object LmStore {

  /** The model fingerprint: the scored corpus' language column (None =
    * one global model) and the key family. */
  case class Params(langCol: Option[String], hashed: Boolean) {
    def render: String = {
      // JSON-escaped: a column name containing a quote or backslash
      // must round-trip through the sidecar, not corrupt it.
      val l = langCol.map(ArtifactStore.jsonString).getOrElse("null")
      s"""{"langCol":$l,"hashed":$hashed}"""
    }
  }

  private val Sidecar = ArtifactStore.Sidecar
  private val ModelDir = "model"
  // The three component tables inside model/ — a swap candidate is only
  // complete when every one carries its _SUCCESS marker.
  private val Components = Seq("bigrams", "contexts", "tokens")

  private def fs(spark: SparkSession, dir: String): FileSystem =
    ArtifactStore.fs(spark, dir)

  /** Train on `refDocs` (the caller pre-filters to the reference
    * slice) and persist (overwrite) with the sidecar. */
  def build(refDocs: DataFrame, id: String, text: String, dir: String,
            params: Params): Unit =
    write(Corpus.lmTrain(refDocs, id, text, params.langCol,
      params.hashed), dir, params)

  /** Persist an already-trained model (overwrite) with the sidecar. */
  def write(lm: Corpus.LmModel, dir: String, params: Params): Unit = {
    val spark = lm.bigrams.sparkSession
    writeModel(lm, s"$dir/$ModelDir")
    writeSidecar(fs(spark, dir), new Path(dir, Sidecar), params)
  }

  private def writeModel(lm: Corpus.LmModel, root: String): Unit = {
    lm.bigrams.withColumnRenamed("__lang", "lang")
      .write.mode("overwrite").parquet(s"$root/bigrams")
    lm.contexts.withColumnRenamed("__lang", "lang")
      .write.mode("overwrite").parquet(s"$root/contexts")
    lm.tokens.withColumnRenamed("__lang", "lang")
      .write.mode("overwrite").parquet(s"$root/tokens")
  }

  /** The artifact, verified against the caller's parameters AND the
    * structural facts of the stored model: the key columns' type must
    * match the declared key family (a hashed model read as strings —
    * or vice versa — would join on nothing and score everything as
    * unseen), every count must be ≥ 1 (zero/negative counts can only
    * come from a botched out-of-band edit — [[subtract]] drops
    * zeroes), and the context total must equal the bigram total (both
    * count the same occurrences; a mismatch means the tables come
    * from different training runs). */
  def read(spark: SparkSession, dir: String, params: Params)
      : Corpus.LmModel = {
    val f = fs(spark, dir)
    recoverSwap(f, dir)
    requireParams(spark, dir, params, "read")
    // Torn-component refusal before the structural checks — a count
    // table truncated out-of-band keeps valid totals and would score
    // silently shifted perplexities.
    ArtifactStore.requireCommitted(f, dir, ModelDir, Components,
      "LmStore")
    val keyType = if (params.hashed) "bigint" else "string"
    def load(comp: String, key: String, cnt: String): DataFrame = {
      val df = spark.read.parquet(s"$dir/$ModelDir/$comp")
      val kt = df.schema(key).dataType.simpleString
      require(kt == keyType,
        s"LmStore.read: $comp/$key at $dir is $kt but ${params.render} " +
          s"declares $keyType keys — key-family drift scores every " +
          "bigram as unseen")
      df.withColumnRenamed("lang", "__lang")
    }
    val lm = Corpus.LmModel(load("bigrams", "bgk", "c2"),
      load("contexts", "w1k", "c1"), load("tokens", "tkk", "c"))
    val row = lm.bigrams.agg(coalesce(sum("c2"), lit(0L)),
      coalesce(min("c2"), lit(1L))).head()
    val rowC = lm.contexts.agg(coalesce(sum("c1"), lit(0L)),
      coalesce(min("c1"), lit(1L))).head()
    val rowT = lm.tokens.agg(count(lit(1)),
      coalesce(min("c"), lit(1L))).head()
    require(row.getLong(1) >= 1 && rowC.getLong(1) >= 1 &&
        rowT.getLong(1) >= 1,
      s"LmStore.read: non-positive counts at $dir — the artifact was " +
        "edited out-of-band")
    require(row.getLong(0) == rowC.getLong(0),
      s"LmStore.read: bigram total ${row.getLong(0)} != context total " +
        s"${rowC.getLong(0)} at $dir — component tables are from " +
        "different training runs")
    require(rowT.getLong(0) >= 1,
      s"LmStore.read: empty vocabulary at $dir — refusing a model that " +
        "scores every document 0")
    lm
  }

  /** Merge the counts of newly added reference docs into the stored
    * model — the reference-growth path (the corpus LM is never
    * retrained from scratch for an incremental harvest). */
  def append(refIncrement: DataFrame, id: String, text: String,
             dir: String, params: Params): Unit =
    merge(refIncrement, id, text, dir, params, sign = 1L, "append")

  /** Subtract the counts of previously appended reference docs — the
    * takedown path. Keys whose count reaches zero disappear; the
    * result is bit-identical to a model never trained on those docs
    * (counts are additive, so subtraction is append's exact inverse).
    * The caller asserts the docs WERE part of the stored reference —
    * like [[BandStore.append]]'s id-disjointness, the store cannot
    * verify membership without provenance it does not keep. */
  def subtract(refRemoved: DataFrame, id: String, text: String,
               dir: String, params: Params): Unit =
    merge(refRemoved, id, text, dir, params, sign = -1L, "subtract")

  private def merge(refDocs: DataFrame, id: String, text: String,
                    dir: String, params: Params, sign: Long,
                    op: String): Unit = {
    val spark = refDocs.sparkSession
    val stored = read(spark, dir, params)
    val inc = Corpus.lmTrain(refDocs, id, text, params.langCol,
      params.hashed)
    def merged(a: DataFrame, b: DataFrame, key: String,
               cnt: String): DataFrame =
      a.unionByName(b.withColumn(cnt, col(cnt) * sign))
        .groupBy("__lang", key).agg(sum(cnt).as(cnt))
        .filter(col(cnt) > 0)
    val f = fs(spark, dir)
    // Writer-path-only cleanup of crashed runs' leftovers (single
    // maintenance writer by contract) — a READER never deletes a temp,
    // which is what used to make a per-batch read able to destroy a
    // concurrent merge's half-written build.
    ArtifactStore.cleanStaleTmps(f, dir, ModelDir)
    // The complete replacement model is materialized BEFORE the swap,
    // then promoted as one unit — the three tables are only consistent
    // together (read() enforces the bigram/context total equality).
    // The temp name is unique per run and commitSwap verifies all three
    // component _SUCCESS markers before the live model moves aside.
    val next = Corpus.LmModel(
      merged(stored.bigrams, inc.bigrams, "bgk", "c2"),
      merged(stored.contexts, inc.contexts, "w1k", "c1"),
      merged(stored.tokens, inc.tokens, "tkk", "c"))
    val tmp = ArtifactStore.newTmpPath(dir, ModelDir)
    writeModel(next, tmp.toString)
    ArtifactStore.commitSwap(f, dir, ModelDir, tmp, Components,
      "LmStore", op)
  }

  /** Score `docs` against the persisted model (read-verified) — the
    * nightly serve path. */
  def score(spark: SparkSession, dir: String, params: Params,
            docs: DataFrame, id: String, text: String,
            broadcastModel: Boolean = true): DataFrame =
    Corpus.lmScoreWith(docs, id, text, read(spark, dir, params),
      params.langCol, broadcastModel, params.hashed)

  /** Complete a [[merge]] swap interrupted by a crash — the shared
    * [[ArtifactStore.recoverSwap]] discipline on the one `model/` unit
    * (promote only a temp whose three component `_SUCCESS` markers
    * prove it complete; never delete a temp from the read path — a
    * concurrent [[append]] may be mid-write in it). Idempotent; called
    * by every entry point. */
  private def recoverSwap(f: FileSystem, dir: String): Unit =
    ArtifactStore.recoverSwap(f, dir, ModelDir, Components, "LmStore")

  /** The stored parameters, or None when no artifact exists. */
  def readParams(spark: SparkSession, dir: String): Option[Params] =
    ArtifactStore.readSidecarText(fs(spark, dir), dir).map { text =>
      Params(
        ArtifactStore.stringOrNullField(text, "langCol", "LmStore", dir),
        ArtifactStore.boolField(text, "hashed", "LmStore", dir))
    }

  private def writeSidecar(f: FileSystem, p: Path,
                           params: Params): Unit =
    ArtifactStore.writeSidecar(f, p, params.render)

  private def requireParams(spark: SparkSession, dir: String,
                            expected: Params, op: String): Unit =
    readParams(spark, dir) match {
      case None =>
        throw new IllegalStateException(
          s"LmStore.$op: no $Sidecar sidecar at $dir — refusing to score " +
            "against a model whose key family and language partitioning " +
            "are unknown (a mismatch yields silently wrong scores)")
      case Some(stored) if stored != expected =>
        throw new IllegalStateException(
          s"LmStore.$op: parameter mismatch at $dir — artifact built " +
            s"with ${stored.render}, caller expects ${expected.render}; " +
            "scoring across model families yields silently wrong scores")
      case _ => ()
    }
}
