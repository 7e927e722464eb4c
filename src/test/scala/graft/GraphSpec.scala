package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.Citations

/** Citation edge-list operators (ref: sources/oci.py). */
class GraphSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def edges(rows: (String, String)*) =
    rows.toSeq.toDF("citing", "cited")

  test("fromCsvLines drops header/blank/short lines and cuts fields 2-3") {
    val lines = Seq(
      "oci,citing,cited,creation,timespan", // header anywhere in line
      "prefix oci,citing,cited",            // grep -vF: substring match
      "",                                    // blank
      "oci:1-2",                             // too few fields
      "oci:1-2,10.1/a,10.2/b,2020-01-01,P1Y",
      "oci:3-4,10.3/c,10.4/d"                // trailing fields optional
    ).toDF("line")
    val out = Citations.fromCsvLines(lines, "line")
      .as[(String, String)].collect().toSet
    assert(out == Set("10.1/a" -> "10.2/b", "10.3/c" -> "10.4/d"))
  }

  test("unique lists and union-distinct") {
    val e = edges("a" -> "x", "a" -> "y", "b" -> "x", "b" -> "x")
    assert(Citations.citingUnique(e).as[String].collect().toSet == Set("a", "b"))
    assert(Citations.citedUnique(e).as[String].collect().toSet == Set("x", "y"))
    assert(Citations.allDoisUnique(e).as[String].collect().toSet ==
      Set("a", "b", "x", "y"))
  }

  test("mostCited counts raw edges and tie-breaks on DOI") {
    val e = edges("a" -> "x", "b" -> "x", "a" -> "y", "b" -> "y", "c" -> "z")
    val top = Citations.mostCited(e, 2).as[(String, Long)].collect().toSeq
    assert(top == Seq("x" -> 2L, "y" -> 2L)) // z cut; x before y on tie
  }

  test("coCitedPairs counts shared citers, dedups within a citer") {
    val e = edges(
      "p1" -> "x", "p1" -> "y", "p1" -> "y", // duplicate ref collapses
      "p2" -> "x", "p2" -> "y",
      "p3" -> "x", "p3" -> "z")
    val pairs = Citations.coCitedPairs(e, minShared = 2)
      .as[(String, String, Long)].collect().toSet
    assert(pairs == Set(("x", "y", 2L))) // (x,z) shares only p3
  }

  test("hub cap drops oversized reference lists before pair explosion") {
    val hub = (1 to 10).map(i => "review" -> s"r$i")
    val e = edges(hub ++ Seq("p" -> "r1", "p" -> "r2",
      "q" -> "r1", "q" -> "r2"): _*)
    val pairs = Citations.coCitedPairs(e, minShared = 2, maxReferences = 5)
      .as[(String, String, Long)].collect().toSet
    // The 10-reference hub is excluded; only p,q corroborate (r1,r2).
    assert(pairs == Set(("r1", "r2", 2L)))
  }

  test("couplingPairs is the transpose of coCitedPairs") {
    val e = edges("a" -> "x", "b" -> "x", "a" -> "y", "b" -> "y", "c" -> "y")
    val pairs = Citations.couplingPairs(e, minShared = 2)
      .as[(String, String, Long)].collect().toSet
    assert(pairs == Set(("a", "b", 2L)))
  }

  test("selfCitationByPrefix computes per-prefix share") {
    val e = edges(
      "10.1/a" -> "10.1/b", "10.1/a" -> "10.2/c",
      "10.2/d" -> "10.2/e")
    val out = Citations.selfCitationByPrefix(e)
      .as[(String, Long, Long, Double)].collect().toMap2
    assert(out("10.1") == ((2L, 1L, 0.5)))
    assert(out("10.2") == ((1L, 1L, 1.0)))
  }

  private implicit class MapOps(rows: Array[(String, Long, Long, Double)]) {
    def toMap2: Map[String, (Long, Long, Double)] =
      rows.map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
  }
}
