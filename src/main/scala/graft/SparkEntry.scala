package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full registry of operator queries (SURVEY §2 inventory + LLM
    * pipeline ops + license tagging). */
  val registry: Seq[Q] =
    CoreQueries.all ++ JoinQueries.all ++ FilterQueries.all ++
      MiscQueries.all ++ LlmQueries.all ++ LicenseQueries.all ++
      PipelineQueries.all ++ SourceQueries.all ++ CrossrefQueries.all ++
      FeedQueries.all ++ CorpusQueries.all ++ GraphQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. A miniature AIUpdate spine (workflows/ai.py:116-342):
    * union source slices → sanitize → analyze → exact-dup groupcover →
    * export mapping with embedded fullrecord. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
    val slices = Seq(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1).drop("n_chars"))
    val unioned = operators.Ops.unionSources(slices)
      .withColumn("labels",
        array(concat(lit("L-"), col("lang")), concat(lit("S-"), col("source"))))
      .withColumn("fp", llm.TextAnalysis.fingerprint(col("text")))
      .withColumn("quality", llm.TextAnalysis.qualityScore(col("text")))
    val covered = operators.GroupCover(
      unioned, "doc_id", "source", "fp", "labels", CoreQueries.DocPrefs)
    covered.select(
      functions.Scalars.synthesizeId(
        regexp_extract(col("source"), "[0-9]+", 0), col("fp")).as("id"),
      col("doc_id"), col("quality"), col("labels"),
      to_json(struct(col("doc_id"), col("lang"),
        pipeline.AiUpdate.canonicalQuality(col("quality")).as("quality")))
        .as("fullrecord"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash-family-dependent ops
    * (driver records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(name, _, Some(sql)) => name -> sql }.toMap
}
