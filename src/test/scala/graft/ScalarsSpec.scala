package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Scalars

class ScalarsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("v").select(c.as("r")).as[String].head()

  test("F1 base64Id strips padding") {
    assert(eval1(Scalars.base64Id(col("v")), "hello") == "aGVsbG8")
    assert(eval1(Scalars.base64Id(col("v")), "hell") == "aGVsbA")
  }

  test("F1 base64Id never ends in '=' (property, seeded)") {
    val rnd = new scala.util.Random(42)
    val samples = (1 to 40).map(_ =>
      rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
    val got = samples.toDF("v")
      .select(Scalars.base64Id(col("v")).as("r")).as[String].collect()
    got.foreach(r => assert(!r.endsWith("=")))
  }

  test("F6 normalizeDoi strips resolver prefixes case-insensitively") {
    val cases = Map(
      "https://doi.org/10.1006/BULM.2002.0328" -> "10.1006/bulm.2002.0328",
      "HTTPS://DOI.ORG/10.1/x" -> "10.1/x",
      "http://dx.doi.org/10.1/Y" -> "10.1/y",
      "10.1/already-bare" -> "10.1/already-bare")
    cases.foreach { case (in, want) =>
      assert(eval1(Scalars.normalizeDoi(col("v")), in) == want, in)
    }
  }

  test("F6 doiPrefix takes the registrant part") {
    assert(eval1(Scalars.doiPrefix(col("v")), "10.1006/bulm.2002.0328") == "10.1006")
    assert(eval1(Scalars.doiPrefix(col("v")), "noslash") == "noslash")
  }

  test("F7 ISSN shape accepts X check digit, rejects malformed") {
    val ok = Seq("1672-5123", "0001-123X", "9999-000x")
    val bad = Seq("16725123", "1672-51234", "167a-5123", "1672_5123", "")
    val df = (ok ++ bad).toDF("v")
    val kept = df.filter(Scalars.isIssn(col("v"))).as[String].collect().toSet
    assert(kept == ok.toSet)
  }

  test("F5 yearToRfc3339 and extractYear round-trip") {
    val df = Seq("published around 1997, reprint 2004").toDF("v")
    val got = df.select(
      Scalars.yearToRfc3339(Scalars.extractYear(col("v"))).as("r")).as[String].head()
    assert(got == "1997-01-01T00:00:00Z")
  }

  test("F3 deListify returns first element or default") {
    val df = Seq(Seq("a", "b"), Seq.empty[String]).toDF("arr")
    val got = df.select(Scalars.deListify(col("arr"), lit("dflt")).as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("a", "dflt"))
  }

  test("tokens trims and splits on runs of whitespace") {
    val df = Seq("  a  b c ").toDF("v")
    assert(df.select(Scalars.tokens(col("v")).as("t")).as[Seq[String]].head()
      == Seq("a", "b", "c"))
  }

  test("canonicalText is token-order insensitive (property, seeded)") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 30).map { _ =>
      val words = (1 to (1 + rnd.nextInt(20))).map(_ => s"w${rnd.nextInt(50)}")
      (words.mkString(" "), rnd.shuffle(words).mkString(" "))
    }
    val got = pairs.toDF("a", "b").select(
      Scalars.canonicalText(col("a")).as("ca"),
      Scalars.canonicalText(col("b")).as("cb")).as[(String, String)].collect()
    got.foreach { case (ca, cb) => assert(ca == cb) }
  }
}
