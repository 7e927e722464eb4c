package graft.streaming

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
  * batch: union(snapshot, new records) → window rank → overwrite
  * snapshot. At 100 TB the snapshot would be partitioned by key hash
  * and the merge would rewrite only partitions containing new keys —
  * the hook for that is the `partitions` bucketing column.
  */
object IncrementalSnapshot {

  /** Latest-per-key compaction of a static frame (the W3 batch core). */
  def compact(df: DataFrame, key: String, orderCol: String, tiebreak: String): DataFrame =
    graft.operators.Ops.latestPerKey(
      Seq(col(key)), Seq(col(orderCol), col(tiebreak)))(df)

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
        val fs = new org.apache.hadoop.fs.Path(snapshotDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val staging = snapshotDir + "__staging"
        try {
          val batch = batch0
            .withColumn("__bucket", pmod(xxhash64(col(key)), lit(buckets)))
          val exists =
            fs.exists(new org.apache.hadoop.fs.Path(snapshotDir, "_SUCCESS")) ||
              fs.globStatus(new org.apache.hadoop.fs.Path(
                snapshotDir, "__bucket=*")).nonEmpty
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
        } finally {
          fs.delete(new org.apache.hadoop.fs.Path(staging), true)
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
        val merged = {
          val fs = new org.apache.hadoop.fs.Path(snapshotDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val existing =
            if (fs.exists(new org.apache.hadoop.fs.Path(snapshotDir, "_SUCCESS")))
              Some(spark.read.parquet(snapshotDir))
            else None
          val all = existing.map(_.unionByName(batch, allowMissingColumns = true))
            .getOrElse(batch)
          compact(all, key, orderCol, tiebreak)
        }
        // Stage then swap: the snapshot read above is materialized into
        // the staging dir before the overwrite, so the batch never
        // reads and writes the same files concurrently.
        val staging = snapshotDir + "__staging"
        merged.write.mode("overwrite").parquet(staging)
        spark.read.parquet(staging).write.mode("overwrite").parquet(snapshotDir)
        new org.apache.hadoop.fs.Path(staging)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(staging), true)
        ()
      }
      .start()
  }
}
