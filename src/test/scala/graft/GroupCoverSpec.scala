package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GroupCover

/** Golden tests for A5 groupcover — the FIXTURES.md §A4 shape
  * (semantics from workflows/ai.py:283-342 + docs/ai-overview slides):
  * winner keeps labels; losers lose only the overlap; nothing is
  * dropped; null keys untouched. */
class GroupCoverSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // Reference preference order (workflows/ai.py:300).
  val Prefs = Seq("85", "55", "89", "60", "50", "105", "101", "53", "49", "28", "48", "121")

  val fixture = Seq(
    // A4 fixture: same DOI from sources 49 and 105; 105 outranks 49.
    ("ai-49-aHR0cDo", "49", "10.1006/bulm.2002.0328", Seq("DE-14", "DE-Brt1")),
    ("dswarm-105-MT", "105", "10.1006/bulm.2002.0328",
      Seq("DE-Mit1", "DE-14", "DE-Brt1", "DE-15")),
    // Loser with non-overlapping extra label keeps it.
    ("ai-28-x", "28", "10.5/z", Seq("DE-15", "DE-540")),
    ("ai-55-y", "55", "10.5/z", Seq("DE-15")),
    // Singleton group — untouched.
    ("ai-49-solo", "49", "10.9/solo", Seq("DE-1")),
    // Null/empty keys — untouched even though labels overlap.
    ("ai-49-nokey", "49", null, Seq("DE-14")),
    ("ai-105-nokey", "105", "", Seq("DE-14")))

  lazy val result: Map[String, Seq[String]] = {
    val df = fixture.toDF("id", "source", "doi", "labels")
    GroupCover(df, "id", "source", "doi", "labels", Prefs)
      .select("id", "labels").as[(String, Seq[String])].collect().toMap
  }

  test("winner keeps all labels") {
    assert(result("dswarm-105-MT") == Seq("DE-Mit1", "DE-14", "DE-Brt1", "DE-15"))
  }

  test("loser sheds exactly the overlap with the winner") {
    assert(result("ai-49-aHR0cDo") == Seq.empty)
    assert(result("ai-28-x") == Seq("DE-540"))
    assert(result("ai-55-y") == Seq("DE-15"))
  }

  test("no rows dropped; singletons and keyless rows untouched") {
    assert(result.size == fixture.size)
    assert(result("ai-49-solo") == Seq("DE-1"))
    assert(result("ai-49-nokey") == Seq("DE-14"))
    assert(result("ai-105-nokey") == Seq("DE-14"))
  }

  test("changes view emits only shrunk rows as (id, labels)") {
    val df = fixture.toDF("id", "source", "doi", "labels")
    val ch = GroupCover.changes(df, "id", "source", "doi", "labels", Prefs)
      .as[(String, Seq[String])].collect().toMap
    assert(ch.keySet == Set("ai-49-aHR0cDo", "ai-28-x"))
    assert(ch("ai-49-aHR0cDo") == Seq.empty)
  }

  test("A5+J7 spine: applying the changes file reproduces direct groupcover") {
    import org.apache.spark.sql.functions._
    val df = fixture.toDF("id", "source", "doi", "labels")
    val direct = GroupCover(df, "id", "source", "doi", "labels", Prefs)
      .select("id", "labels").as[(String, Seq[String])].collect().toMap
    val changes = GroupCover.changes(df, "id", "source", "doi", "labels", Prefs)
      .withColumnRenamed("labels", "new_labels")
    // span-update-labels semantics: replace labels by id where a change
    // exists (workflows/ai.py:310-342).
    val applied = df.join(changes, Seq("id"), "left")
      .withColumn("labels", coalesce(col("new_labels"), col("labels")))
      .select("id", "labels").as[(String, Seq[String])].collect().toMap
    assert(applied == direct)
  }

  test("unknown sources rank after all known, tie broken by id") {
    val df = Seq(
      ("b-unknown", "999", "10.7/k", Seq("X")),
      ("a-unknown", "998", "10.7/k", Seq("X", "Y"))).toDF("id", "source", "doi", "labels")
    val r = GroupCover(df, "id", "source", "doi", "labels", Prefs)
      .select("id", "labels").as[(String, Seq[String])].collect().toMap
    // Both unranked → id order decides: a-unknown wins.
    assert(r("a-unknown") == Seq("X", "Y"))
    assert(r("b-unknown") == Seq.empty)
  }

  test("null winner labels remove nothing from losers") {
    val df = Seq(
      ("w", "85", "k1", null.asInstanceOf[Seq[String]]),
      ("l", "55", "k1", Seq("DE-15", "DE-14")))
      .toDF("id", "source", "key", "labels")
    val r = GroupCover(df, "id", "source", "key", "labels", Prefs)
      .select("id", "labels").as[(String, Seq[String])].collect().toMap
    assert(r("w") == null)
    assert(r("l") == Seq("DE-15", "DE-14"))
    // And such rows are not spurious "changes".
    val ch = GroupCover.changes(df, "id", "source", "key", "labels", Prefs)
    assert(ch.count() == 0)
  }
}
