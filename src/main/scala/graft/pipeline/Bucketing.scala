package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-artifact support — the shuffle-elimination lever the task
  * layer offers for the joins that dominate at 100 TB.
  *
  * The reference's AI spine joins the same keys over and over: records
  * ⨝ label-changes on `finc.id` (workflows/ai.py:310-342), local-data
  * ⨝ groupcover output on lowercased DOI (workflows/ai.py:250-307),
  * snapshot-vs-snapshot diffs on DOI. In the reference every such step
  * re-sorts the whole file (`sort -S35%`); in naive Spark every join
  * re-shuffles ~1 TB of records. Writing the artifact bucketed by its
  * join key moves that shuffle into the (once-per-artifact) write:
  * every subsequent join against another table bucketed the same way
  * plans with ZERO Exchange nodes — at 1000 executors that is the
  * difference between an all-to-all of the full snapshot per join and
  * none.
  *
  * Spark constraints honored here: bucketed tables must go through the
  * catalog (`saveAsTable`), both sides must agree on bucket count, and
  * AQE cannot coalesce away the bucket layout (it leaves bucketed scans
  * alone). Sorting within buckets (`sortBy`) additionally lets
  * SortMergeJoin skip its sort for sequential merge — the one context
  * where an SMJ without Exchange IS the 100 TB plan of choice.
  */
object Bucketing {

  /** Write `df` as a bucketed (and in-bucket sorted) managed parquet
    * table. One shuffle here buys shuffle-free joins for every
    * downstream consumer keyed on `keys`. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys. The plan this
    * produces contains no Exchange on either side — assert with
    * [[exchangeCount]] in tests or plan audits. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   keys: Seq[String],
                   joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)

  /** Number of shuffle Exchange operators in a DataFrame's executed
    * plan — 0 for a properly co-located bucketed join. AQE wraps the
    * real plan in AdaptiveSparkPlanExec (whose inner plan is a field,
    * not a child, so a plain collect sees nothing) — unwrap it, and
    * count materialized shuffle stages too for already-executed plans. */
  def exchangeCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect {
      case e: ShuffleExchangeLike => e
      case s: ShuffleQueryStageExec => s
    }.size
  }
}
