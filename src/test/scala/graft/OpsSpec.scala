package graft

import org.apache.spark.sql.{Observation, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ops

/** Operator-kit details not covered by the oracle queries: observe
  * metrics side-channel and bucketed co-located joins. */
class OpsSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  test("A4 observe metrics ride the job without a second scan") {
    val obs = Observation("quality")
    val df = Ops.withQualityMetrics(
      Tables.documents(spark, Sf), obs, col("n_chars") < 150)
    val n = df.count()
    val row = obs.get
    assert(row("n_records") == n)
    val errs = row("n_errors").asInstanceOf[Long]
    assert(errs > 0 && errs < n)
  }

  test("a8: approx_percentile rank error stays within the sketch bound") {
    // The a8 registry entry is rows-only (sketch internals are engine-
    // specific) — this is its g9-style value gate: the returned value
    // must sit within the declared 1/accuracy RANK error of the target
    // fraction. approx_percentile returns actual data values, so the
    // check is on the value's CDF window in the exactly-sorted group.
    val li = Tables.lineitem(spark, Sf).select(
      col("l_returnflag").as("g"),
      col("l_extendedprice").cast("double").as("v"))
    val approx = li.groupBy("g")
      .agg(expr("approx_percentile(v, array(0.25D, 0.5D, 0.75D), 10000)")
        .as("qs"))
      .as[(String, Seq[Double])].collect().toMap
    val groups = li.as[(String, Double)].collect()
      .groupBy(_._1).map { case (g, rows) => g -> rows.map(_._2).sorted }
    assert(groups.keySet == approx.keySet && groups.nonEmpty)
    for ((g, vals) <- groups; (frac, i) <- Seq(0.25, 0.5, 0.75).zipWithIndex) {
      val got = approx(g)(i)
      val n = vals.length
      // The value's CDF window: [share strictly below, share at-or-below].
      val lo = vals.count(_ < got).toDouble / n
      val hi = vals.count(_ <= got).toDouble / n
      val tol = 1.0 / 10000 + 1.0 / n
      assert(vals.contains(got), s"$g q$i: $got is not a data value")
      assert(frac >= lo - tol && frac <= hi + tol,
        s"$g q$i: value $got covers CDF [$lo, $hi], target $frac ± $tol")
    }
  }

  test("latestPerKeyAgg (max_by) equals latestPerKey (window rank)") {
    val o = Tables.orders(spark, Sf)
    val okey = datediff(col("o_orderdate"), lit("1990-01-01")).cast("long") *
      100000000L + col("o_orderkey")
    val viaWindow = Ops.latestPerKey(
        Seq(col("o_custkey")), Seq(col("o_orderdate"), col("o_orderkey")))(o)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    val viaAgg = Ops.latestPerKeyAgg(Seq("o_custkey"), okey)(o)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("bucketed tables co-locate the join: no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // A previous JVM's warehouse dirs survive the in-memory catalog —
    // saveAsTable refuses to reuse the location.
    for (t <- Seq("b_orders", "b_customer")) {
      val dir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
    Tables.orders(spark, Sf)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    Tables.customer(spark, Sf)
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.mode(SaveMode.Overwrite)
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_customer")

    // Disable broadcast so the join would otherwise shuffle both sides.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), Seq("o_custkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
      assert(plan.contains("SortMergeJoin"), plan.take(600))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("latestPerKeyAgg drops all-null-order groups instead of emitting ghost rows") {
    val df = Seq(
      ("k1", Some(5L), "a"), ("k1", Some(7L), "b"),
      ("k2", None, "c"), ("k2", None, "d"))
      .toDF("k", "ord", "v")
      .select($"k", $"ord".cast("long").as("ord"), $"v")
    val got = Ops.latestPerKeyAgg(Seq("k"), col("ord"))(df)
      .select("k", "v").as[(String, String)].collect().toSet
    // k2 has no orderable row -> no row at all (never an all-null row).
    assert(got == Set(("k1", "b")))
  }

  test("unionSources on empty input fails with a named error") {
    val e = intercept[IllegalArgumentException](Ops.unionSources(Seq.empty))
    assert(e.getMessage.contains("unionSources"))
  }

  test("testdata invariant: documents.text has no multi-space/tab/newline runs") {
    // Every text-op oracle tokenizes with string_split(trim(text), ' ')
    // while the Spark side splits on \\s+ — parity holds only while the
    // driver's synthetic text uses single spaces. Fail loudly here if a
    // regenerated testdata set ever breaks that, instead of letting a
    // dozen oracle rows silently diverge.
    val bad = Tables.documents(spark, Sf)
      .filter(col("text").rlike("[\\t\\n\\r]| {2,}"))
      .count()
    assert(bad == 0, s"$bad documents contain whitespace runs")
  }
}
