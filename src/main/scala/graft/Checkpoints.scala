package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation with a CONFIG-DRIVEN strategy (guide §5) — the
  * one seam every query-path materialization barrier goes through.
  *
  * `spark.graft.checkpoint.dir` unset (local mode, tests, the bench):
  * `localCheckpoint()` — blocks live on the executors that computed
  * them, no directory needed, computed once.
  *
  * `spark.graft.checkpoint.dir` set (a cluster deployment):
  * durable `checkpoint()` into that directory — localCheckpoint blocks
  * are NOT recomputable (losing the holding executor kills the query,
  * and pinned blocks defeat dynamic deallocation), so at 100 TB the
  * truncated intermediates must live on HDFS/object storage. The
  * standard trade applies: a reliable checkpoint re-runs the subtree
  * once more to write the files.
  *
  * The plan shape is identical either way (both produce a LogicalRDD
  * scan), so the local bench measures the same operators a cluster
  * run executes. `setCheckpointDir` is SparkContext-global and
  * appends a UUID subdir per registration, which also isolates
  * concurrent queries from each other's checkpoint files.
  */
object Checkpoints {
  val DirConf = "spark.graft.checkpoint.dir"

  def truncate(df: DataFrame): DataFrame = {
    val dir = df.sparkSession.conf.get(DirConf, "")
    if (dir.isEmpty) df.localCheckpoint()
    else {
      df.sparkSession.sparkContext.setCheckpointDir(dir)
      df.checkpoint()
    }
  }

  /** Postfix form so call sites keep their chained shape:
    * `.localCheckpoint()` becomes `.truncateLineage()`. */
  implicit class TruncateOps(private val df: DataFrame) extends AnyVal {
    def truncateLineage(): DataFrame = truncate(df)
  }
}
