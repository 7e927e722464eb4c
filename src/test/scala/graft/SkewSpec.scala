package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join / salted holistic aggregation: result equivalence with
  * the unsalted forms, and the partition-spread property the salt is
  * for. */
class SkewSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val fact = Seq.tabulate(1000)(i =>
    (if (i < 900) "hot" else s"k${i % 17}", i.toLong)) // 90% one key
    .toDF("key", "row_id")
  private val dim = Seq("hot" -> "H", "k1" -> "A", "k2" -> "B", "k16" -> "Z")
    .toDF("key", "label")

  test("saltedJoin(inner) equals the plain join") {
    val plain = fact.join(dim, Seq("key"), "inner")
    val salted = Skew.saltedJoin(fact, dim, "key", col("row_id"), 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin(left) keeps unmatched fact rows exactly once") {
    val plain = fact.join(dim, Seq("key"), "left")
    val salted = Skew.saltedJoin(fact, dim, "key", col("row_id"), 8, "left")
    assert(salted.count() == 1000)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin rejects right/full joins and factor < 1") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "key", col("row_id"), 8, "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "key", col("row_id"), 0)
    }
  }

  test("the salt actually spreads the hot key across tasks") {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col("row_id")), lit(8)))
    val spread = salted.filter(col("key") === "hot")
      .groupBy("__salt").count().collect()
    assert(spread.length == 8) // all 8 salt values used
    assert(spread.map(_.getLong(1)).max < 900) // no salt holds everything
  }

  test("saltedCollectSet equals the unsalted set, sorted") {
    val df = Seq.tabulate(500)(i => (s"g${i % 3}", s"v${i % 37}"))
      .toDF("g", "v")
    val plain = df.groupBy("g")
      .agg(sort_array(collect_set(col("v"))).as("values"))
    val salted = Skew.saltedCollectSet(df, Seq("g"), col("v"), 8)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedCollectSet is deterministic across reruns") {
    val df = Seq.tabulate(200)(i => (s"g${i % 2}", i % 50)).toDF("g", "v")
    val a = Skew.saltedCollectSet(df, Seq("g"), col("v"), 4).collect()
    val b = Skew.saltedCollectSet(df, Seq("g"), col("v"), 4).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }
}
