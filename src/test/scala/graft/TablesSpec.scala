package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** The events loader must be self-describing across testdata precision
  * drift: earlier driver rounds wrote `ts` as TIMESTAMP(NANOS) (which
  * Spark 4 cannot even footer-infer), round-9+ writes timestamp[us].
  * The r9 regression was a hard-coded nanos assumption silently ÷1000-ing
  * microsecond data; this spec pins the footer-driven branch with one
  * fixture of each precision.
  *
  * Spark itself cannot write a NANOS fixture (it rejects the type), so
  * the nanos file is written with parquet-mr's example writer directly —
  * the same library the production footer probe uses, but through the
  * write path, so the fixture is a genuine TIMESTAMP(NANOS) file.
  */
class TablesSpec extends AnyFunSuite {
  import TestSpark.spark

  // 2024-03-01T12:00:00Z and one second later.
  private val micros = Seq(1709294400000000L, 1709294401000000L)

  private def tmp(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(prefix)

  private def cleanup(p: java.nio.file.Path): Unit =
    graft.queries.Fixtures.deleteRecursively(p)

  /** Writes <dir>/events.parquet as a single TIMESTAMP(NANOS) file. */
  private def writeNanosFixture(dir: java.nio.file.Path): Unit = {
    val schema: MessageType = Types
      .buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS)).named("ts")
      .required(PrimitiveTypeName.INT64).named("user_id")
      .required(PrimitiveTypeName.BINARY)
      .as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(PrimitiveTypeName.DOUBLE).named("value")
      .required(PrimitiveTypeName.BINARY)
      .as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new Path(s"file:$dir/events.parquet"))
      .withConf(spark.sessionState.newHadoopConf())
      .withType(schema)
      .build()
    val f = new SimpleGroupFactory(schema)
    try micros.zipWithIndex.foreach { case (us, i) =>
      writer.write(
        f.newGroup()
          .append("event_id", i.toLong)
          .append("ts", us * 1000L) // nanos
          .append("user_id", 7L)
          .append("event_type", "click")
          .append("value", 1.0)
          .append("props", "{}"))
    } finally writer.close()
  }

  /** Writes <dir>/events.parquet as a Spark-native timestamp[us] table. */
  private def writeMicrosFixture(dir: java.nio.file.Path): Unit = {
    import spark.implicits._
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, 7L, "click", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1)
      .write.mode("overwrite").parquet(s"file:$dir/events.parquet")
  }

  test("footer probe detects TIMESTAMP(NANOS) vs native timestamp") {
    val nDir = tmp("graft-ev-nanos"); val uDir = tmp("graft-ev-us")
    try {
      writeNanosFixture(nDir); writeMicrosFixture(uDir)
      assert(Tables.eventsTsIsNanos(spark, s"file:$nDir/events.parquet"))
      assert(!Tables.eventsTsIsNanos(spark, s"file:$uDir/events.parquet"))
    } finally { cleanup(nDir); cleanup(uDir) }
  }

  test("events loader yields identical timestamps for both precisions") {
    val nDir = tmp("graft-ev-nanos"); val uDir = tmp("graft-ev-us")
    try {
      writeNanosFixture(nDir); writeMicrosFixture(uDir)
      val expected = micros.map(us => new java.sql.Timestamp(us / 1000L)).toSet
      for (dir <- Seq(nDir, uDir)) {
        val df = Tables.events(spark, s"file:$dir")
        assert(df.schema("ts").dataType == TimestampType, s"dir=$dir")
        val got = df.select("ts").collect().map(_.getTimestamp(0)).toSet
        assert(got == expected, s"dir=$dir")
      }
    } finally { cleanup(nDir); cleanup(uDir) }
  }

  test("driver testdata loads with sane timestamp range (not 1970)") {
    val ev = Tables.events(spark, TestSpark.Sf)
    assert(ev.schema("ts").dataType == TimestampType)
    val minYear = ev.agg(min(year(col("ts")))).head.getInt(0)
    assert(minYear > 1990, s"events collapsed to epoch: min year $minYear")
  }
}
