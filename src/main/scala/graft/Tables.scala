package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read parquet from
  * it; at 100 TB these would be partitioned tables behind the same names,
  * so nothing here assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** All tables by name — derived from `names` so the list and the
    * loaders cannot drift (ADVICE r01). `events` routes through its
    * ns-timestamp-aware loader. */
  def all(spark: SparkSession, dir: String): Map[String, DataFrame] =
    names.map { n =>
      n -> (if (n == "events") events(spark, dir) else load(spark, dir, n))
    }.toMap

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts is nanosecond-precision parquet, which Spark 4 rejects
    * as a timestamp type; read it as long nanos and convert to a µs
    * timestamp with integer division (a double round trip would lose
    * precision at 1.7e18 ns).
    *
    * The read is fully isolated (ADVICE r02/r03): the explicit user
    * schema skips footer-schema inference — the step that throws
    * PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS) — and the vectorized
    * reader then surfaces the INT64 values as longs directly. That is
    * sufficient on its own (verified empirically on a session with the
    * legacy conf unset; a per-read nanosAsLong option would be a no-op
    * anyway — ParquetFileFormat overwrites that hadoop-conf key from
    * the session SQLConf). No session-global conf is mutated, so
    * externally-built sessions (the driver's harness) are untouched. */
  private val eventsSchema =
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING"
  def events(s: SparkSession, d: String): DataFrame =
    s.read
      .schema(eventsSchema)
      .parquet(s"$d/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Session factory used by tests and ad-hoc mains. Bench/Verify build
    * their own (driver contract), with the same shuffle sizing.
    */
  def localSession(appName: String = "graft", threads: Int = 4): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", threads * 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
