package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** §2.9 extension — incremental harvest → snapshot compaction as
  * Structured Streaming. The reference re-snapshots the full 6 TB feed
  * every run (sources/crossref.py:136-214, "newest record wins"); here
  * new harvest files stream in and merge into a keyed snapshot
  * incrementally, preserving exactly the latest-per-key semantics.
  *
  * Design: file source (landing dir) → foreachBatch merge. Inside each
  * batch: union(snapshot, new records) → window rank → staged write →
  * swap. The staging directory doubles as the crash-recovery artifact:
  * it is deleted only AFTER the snapshot write completes, so a crash in
  * the unprotected window (snapshot partially overwritten) is repaired
  * on replay by restoring from the completed staging copy — the
  * snapshot is never the only copy of merged state while it is being
  * rewritten. At 100 TB the snapshot is partitioned by key hash and the
  * merge rewrites only partitions containing new keys
  * ([[startPartitioned]]).
  */
object IncrementalSnapshot {

  /** Latest-per-key compaction of a static frame (the W3 batch core). */
  def compact(df: DataFrame, key: String, orderCol: String, tiebreak: String): DataFrame =
    graft.operators.Ops.latestPerKey(
      Seq(col(key)), Seq(col(orderCol), col(tiebreak)))(df)

  /** Staging dir as a SIBLING of the snapshot dir — string concat on a
    * trailing-slash path would nest it inside the snapshot and the
    * overwrite would delete the staging files mid-read. */
  private def stagingPath(snapshotDir: String): String =
    snapshotDir.replaceAll("/+$", "") + "__staging"

  /** A dir holds a complete write: commit marker, or (for clusters
    * configured without markers) at least one committed part file. */
  private def isComplete(fs: org.apache.hadoop.fs.FileSystem, dir: String): Boolean =
    fs.exists(new Path(dir, "_SUCCESS")) ||
      fs.globStatus(new Path(dir, "part-*")).nonEmpty

  /** The 100 TB form of the merge: the snapshot is stored partitioned
    * by `pmod(xxhash64(key), buckets)` and each micro-batch rewrites
    * ONLY the partitions its keys touch (dynamic partition overwrite) —
    * batch cost scales with batch size × bucket fraction, not snapshot
    * size. Same newest-wins result as the full rewrite. */
  def startPartitioned(spark: SparkSession, schema: StructType,
                       landingDir: String, snapshotDir: String,
                       checkpointDir: String, key: String, orderCol: String,
                       tiebreak: String, buckets: Int = 64,
                       trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val stream = spark.readStream.schema(schema).json(landingDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val prevMode =
          spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        val fs = new Path(snapshotDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val staging = stagingPath(snapshotDir)
        try {
          // Crash recovery: a completed staging dir means the previous
          // attempt died while rewriting the touched partitions —
          // re-apply it (dynamic overwrite restores exactly those
          // partitions) before processing the replayed batch.
          if (isComplete(fs, staging)) {
            spark.read.parquet(staging)
              .write.mode("overwrite").partitionBy("__bucket").parquet(snapshotDir)
            fs.delete(new Path(staging), true)
          }
          val batch = batch0
            .withColumn("__bucket", pmod(xxhash64(col(key)), lit(buckets)))
          val exists = isComplete(fs, snapshotDir) ||
            fs.globStatus(new Path(snapshotDir, "__bucket=*")).nonEmpty
          val merged =
            if (!exists) batch
            else {
              val touched = batch.select("__bucket").distinct()
              val existing = spark.read.parquet(snapshotDir)
                // Partition-pruned read: only the touched buckets rejoin.
                .join(broadcast(touched), Seq("__bucket"), "left_semi")
              existing.unionByName(batch, allowMissingColumns = true)
            }
          val compacted = graft.operators.Ops.latestPerKey(
            Seq(col(key)), Seq(col(orderCol), col(tiebreak)))(merged)
          compacted.write.mode("overwrite").parquet(staging)
          spark.read.parquet(staging)
            .write.mode("overwrite").partitionBy("__bucket").parquet(snapshotDir)
          // Only after the snapshot write committed — staging is the
          // recovery copy until then.
          fs.delete(new Path(staging), true)
          ()
        } finally {
          prevMode match {
            case Some(m) =>
              spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
            case None =>
              spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
          }
        }
      }
      .start()
  }

  /** Start the incremental merge: watch `landingDir` for new NDJSON
    * harvest slices, fold each micro-batch into the parquet snapshot at
    * `snapshotDir`. Late/updated records are resolved by
    * (orderCol, tiebreak) descending — same winner as a full
    * re-snapshot. */
  def start(spark: SparkSession, schema: StructType,
            landingDir: String, snapshotDir: String, checkpointDir: String,
            key: String, orderCol: String, tiebreak: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val stream = spark.readStream.schema(schema).json(landingDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fs = new Path(snapshotDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val staging = stagingPath(snapshotDir)
        // Crash recovery: the previous attempt completed its merge into
        // staging but died overwriting the snapshot — restore the
        // snapshot from staging first (reading staging, writing the
        // snapshot; a second crash leaves staging intact).
        if (!isComplete(fs, snapshotDir) && isComplete(fs, staging)) {
          spark.read.parquet(staging)
            .write.mode("overwrite").parquet(snapshotDir)
        }
        val merged = {
          val existing =
            if (isComplete(fs, snapshotDir))
              Some(spark.read.parquet(snapshotDir))
            else None
          val all = existing.map(_.unionByName(batch, allowMissingColumns = true))
            .getOrElse(batch)
          compact(all, key, orderCol, tiebreak)
        }
        // Stage then swap: the merge is materialized into the staging
        // dir before the overwrite, so the batch never reads and writes
        // the same files concurrently — and staging survives as the
        // recovery copy until the snapshot write commits.
        merged.write.mode("overwrite").parquet(staging)
        spark.read.parquet(staging).write.mode("overwrite").parquet(snapshotDir)
        fs.delete(new Path(staging), true)
        ()
      }
      .start()
  }
}
