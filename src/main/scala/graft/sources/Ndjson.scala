package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S10 — NDJSON (line-delimited JSON) source/sink, the reference's
  * universal interchange format (`.ldj.zst` artifacts, e.g.
  * workflows/ai.py:159-165).
  *
  * Reads always take an explicit schema — schema inference over 100 TB
  * is a full extra pass and produces unstable types on sparse records
  * (SURVEY §1.4). Writes default to zstd like every reference artifact
  * (`.ldj.zst`), falling back LOUDLY to gzip only when the running
  * Hadoop build lacks a usable zstd codec.
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

  /** Default codec: zstd when the runtime supports it (reference parity —
    * every reference artifact is `.ldj.zst`), otherwise a loud one-time
    * warning and gzip. Pass `compression` explicitly to pin a codec. */
  def write(df: DataFrame, path: String, compression: String = DefaultCodec): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** Resolved once per JVM. Text-sink zstd goes through Hadoop's
    * `ZStandardCodec`, which needs native libhadoop-zstd — unlike parquet
    * zstd (pure-JVM via aircompressor, always available). We probe by
    * actually constructing a compressor, not by classloading alone. */
  lazy val DefaultCodec: String = {
    val ok =
      try {
        val codec = new org.apache.hadoop.io.compress.ZStandardCodec()
        codec.setConf(new org.apache.hadoop.conf.Configuration())
        val c = codec.createCompressor()
        c != null
      } catch { case _: Throwable => false }
    if (ok) "zstd"
    else {
      System.err.println(
        "[graft] WARNING: Hadoop zstd codec unavailable in this runtime; " +
          "Ndjson.write falls back to gzip (reference artifacts are .ldj.zst).")
      "gzip"
    }
  }
}
