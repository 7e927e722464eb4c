package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Bucketing

/** The co-located-join contract: bucketed artifacts join with zero
  * Exchange operators, and the result matches the shuffled join. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  /** Drop the table AND its warehouse location — a crashed earlier run
    * can leave the directory behind with no catalog entry, which makes
    * the next CTAS fail with LOCATION_ALREADY_EXISTS. */
  private def dropHard(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new java.io.File(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      table)
    graft.queries.Fixtures.deleteRecursively(wh.toPath)
  }

  test("same-bucketed tables join with zero shuffle exchanges") {
    val orders = Tables.orders(spark, Sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = Tables.lineitem(spark, Sf)
      .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Seq("b_orders", "b_li").foreach(dropHard)
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 8)
    Bucketing.writeBucketed(li, "b_li", Seq("o_orderkey"), 8)
    try {
      // Force the join to be non-broadcast so co-location is what's
      // actually under test.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_li",
        Seq("o_orderkey"))
      assert(Bucketing.exchangeCount(joined) == 0,
        joined.queryExecution.executedPlan.toString.take(2000))

      // Same result as the plain (shuffled) join.
      val plain = orders.join(li, Seq("o_orderkey"))
      assert(joined.count() == plain.count())
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)

      // The shuffled control really does exchange — the zero above is
      // the bucket layout, not a degenerate plan.
      assert(Bucketing.exchangeCount(plain) > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      Seq("b_orders", "b_li").foreach(dropHard)
    }
  }

  test("bucket-count mismatch still answers correctly (one side reshuffles)") {
    val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 100).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Seq("b_a", "b_b").foreach(dropHard)
    Bucketing.writeBucketed(a, "b_a", Seq("k"), 4)
    Bucketing.writeBucketed(b, "b_b", Seq("k"), 8)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val j = Bucketing.bucketedJoin(spark, "b_a", "b_b", Seq("k"))
      assert(j.count() == 100)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      Seq("b_a", "b_b").foreach(dropHard)
    }
  }
}
