package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{GroupCover, Ops}
import graft.llm.TextAnalysis
import graft.queries.CoreQueries

/** The AIUpdate-analog driver DAG (ref: workflows/ai.py:116-425 —
  * per-source intermediate schemas → union → OA flag → license tag →
  * dedup → export), expressed as memoized [[Task]]s over the synthetic
  * documents table. Each stage is a narrow transform or one keyed
  * shuffle; re-running after a partial failure reuses finished
  * artifacts exactly like the reference's Luigi completeness checks.
  */
object AiUpdate {

  /** Per-"source" slices union (AIIntermediateSchema analog,
    * workflows/ai.py:116-165). */
  class SourceUnion(sfDir: String, date: String)
      extends Task("source_union", date) {
    def build(s: SparkSession, in: Map[String, DataFrame]): DataFrame = {
      val docs = Tables.documents(s, sfDir)
      Ops.unionSources(Seq(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1).drop("n_chars")))
    }
  }

  /** Analysis + OA flagging (AIApplyOpenAccessFlag analog,
    * workflows/ai.py:758-798): flag = source whitelist ∪ quality rule. */
  class Analyzed(up: Task, date: String) extends Task("analyzed", date) {
    override def requires: Seq[Task] = Seq(up)
    def build(s: SparkSession, in: Map[String, DataFrame]): DataFrame =
      in("source_union")
        .withColumn("labels",
          array(concat(lit("L-"), col("lang")), concat(lit("S-"), col("source"))))
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .withColumn("x_oa",
          col("source").isin("src1", "src3", "src5") || col("quality") > 0.8)
  }

  /** Cross-source dedup via groupcover label-diff
    * (AIIntermediateSchemaDeduplicated analog, workflows/ai.py:250-342). */
  class Deduplicated(up: Task, date: String) extends Task("deduplicated", date) {
    override def requires: Seq[Task] = Seq(up)
    def build(s: SparkSession, in: Map[String, DataFrame]): DataFrame =
      GroupCover(in("analyzed"), "doc_id", "source", "fp", "labels",
        CoreQueries.DocPrefs)
  }

  /** Export with embedded fullrecord (AIExport analog,
    * workflows/ai.py:375-408). Every embedded field has ONE canonical
    * text form so the export is byte-reproducible across engines and
    * retries — including the floating-point analysis score, which is
    * embedded as fixed-point text ([[canonicalQuality]]) rather than a
    * JSON double (shortest-round-trip double rendering is
    * engine-specific; a fixed 12-decimal rendering is not, and 12
    * decimals is far past the score's meaningful precision). */
  class Export(up: Task, date: String) extends Task("export", date) {
    override def requires: Seq[Task] = Seq(up)
    def build(s: SparkSession, in: Map[String, DataFrame]): DataFrame =
      in("deduplicated").select(
        concat(lit("ai-"), regexp_extract(col("source"), "[0-9]+", 0),
               lit("-"), col("fp")).as("id"),
        col("doc_id"), col("labels").as("institution"), col("x_oa"),
        col("quality"),
        to_json(struct(col("doc_id"), col("source"), col("lang"),
          col("n_chars"), col("fp"), col("labels"), col("x_oa"),
          canonicalQuality(col("quality")).as("quality")))
          .as("fullrecord"))
  }

  /** Canonical fixed-point rendering for embedded scores: %.12f is
    * locale-free and identical across engines on this data (a
    * divergence would need the exact binary expansion to terminate in
    * a tie at the 13th decimal, which no sum-of-fractions score here
    * does); the pipe14 oracle hash-gates the claim. */
  def canonicalQuality(q: Column): Column = format_string("%.12f", q)

  /** Build the full DAG and run it; returns the export artifact. */
  def run(spark: SparkSession, sfDir: String, baseDir: String,
          date: String): DataFrame = {
    val union = new SourceUnion(sfDir, date)
    val analyzed = new Analyzed(union, date)
    val dedup = new Deduplicated(analyzed, date)
    val export = new Export(dedup, date)
    new TaskRunner(spark, baseDir).run(export)
  }
}
