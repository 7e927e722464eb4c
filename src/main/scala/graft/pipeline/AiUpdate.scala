package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * workflows/ai.py:375-408). The embed carries the RECORD fields
    * (identity, provenance, labels, flag) in a fixed order; the
    * floating-point analysis sidecar (`quality`) stays a top-level
    * column OUTSIDE the embed — JSON double rendering is
    * engine-specific (shortest-round-trip differs), while every
    * embedded field has one canonical text form, which is what keeps
    * the export byte-reproducible across engines and retries. */
  class Export(up: Task, date: String) extends Task("export", date) {
    override def requires: Seq[Task] = Seq(up)
    def build(s: SparkSession, in: Map[String, DataFrame]): DataFrame =
      in("deduplicated").select(
        concat(lit("ai-"), regexp_extract(col("source"), "[0-9]+", 0),
               lit("-"), col("fp")).as("id"),
        col("doc_id"), col("labels").as("institution"), col("x_oa"),
        col("quality"),
        to_json(struct(col("doc_id"), col("source"), col("lang"),
          col("n_chars"), col("fp"), col("labels"), col("x_oa")))
          .as("fullrecord"))
  }

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
