package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S10 — NDJSON (line-delimited JSON) source/sink, the reference's
  * universal interchange format (`.ldj.zst` artifacts, e.g.
  * workflows/ai.py:159-165).
  *
  * Reads always take an explicit schema — schema inference over 100 TB
  * is a full extra pass and produces unstable types on sparse records
  * (SURVEY §1.4). Writes default to zstd like every reference artifact.
  */
object Ndjson {

  def read(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** Permissive read keeping corrupt lines in `_corrupt_record` for a
    * side-channel error count (A4-style QA, sources/jstor.py:696-785). */
  def readPermissive(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Default codec is gzip: Spark's text-based sinks ship without the
    * zstd codec in plain local deployments (parquet zstd is always
    * available); a cluster with hadoop-native zstd passes it in. */
  def write(df: DataFrame, path: String, compression: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)
}
