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
    * as a timestamp type; read it as long nanos (legacy conf) and
    * convert to a µs timestamp with integer division (a double round
    * trip would lose precision at 1.7e18 ns).
    *
    * The nanosAsLong conf is session-wide with no per-read form
    * (ADVICE r02): [[localSession]] sets it at build time; setting it
    * here as well keeps this loader correct under externally-built
    * sessions (the driver's harness constructs its own). The only
    * observable effect on other reads is that ns-timestamp parquet
    * loads as long instead of throwing. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
