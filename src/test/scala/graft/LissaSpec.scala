package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.normalize.Lissa

/** Golden tests for the LISSA ES-hits normalizer
  * (sources/lissa.py:98-180 semantics, including the bug-compatible
  * DOI handling and the url-keeps-DOI-links quirk). */
class LissaSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def is(rows: Seq[String], strict: Boolean = false) =
    Lissa.toIntermediate(
      Lissa.parse(rows.toDF("src_json"), "src_json"), strict)

  private def doc(fields: String) =
    s"""{"id": "x1", "title": "T", "date_published": "2023-05-06T01:02:03.9",
       | $fields}""".stripMargin.replaceAll("\n", "")

  test("full mapping: constants, dates, authors, publishers, urls") {
    val row = is(Seq(
      """{"id": "a9", "title": "A Preprint",
        | "contributors": ["Doe, J", "Roe, R"],
        | "publishers": ["LISSA Press"],
        | "identifiers": ["https://lissarchive.org/item/9",
        |                 "http://dx.doi.org/10.31235/osf.io/abc",
        |                 "oai:lissa:9"],
        | "subjects": ["Sociology|Open Science", "Methods"],
        | "subject_synonyms": ["Sociology"],
        | "tags": ["Open Science"],
        | "date_published": "2023-05-06T01:02:03.987654",
        | "description": "short"}""".stripMargin.replaceAll("\n", "")))
      .collect().head
    assert(row.getAs[String]("record_id") == "ai-179-a9")
    assert(row.getAs[String]("source_id") == "179")
    assert(row.getAs[String]("local_id") == "a9")
    assert(row.getAs[String]("format") == "Preprint")
    assert(row.getAs[String]("genre") == "article")
    assert(row.getAs[String]("ris_type") == "EJOUR")
    assert(row.getAs[String]("mega_collection") == "LISSA,sid-179-col-lissa")
    assert(row.getAs[String]("title") == "A Preprint")
    assert(row.getAs[String]("doi") == "10.31235/osf.io/abc")
    // url keeps every http identifier INCLUDING the DOI link; the
    // oai: identifier is excluded (lissa.py:118-120)
    assert(row.getAs[String]("urls") ==
      "https://lissarchive.org/item/9,http://dx.doi.org/10.31235/osf.io/abc")
    assert(row.getAs[String]("authors") == "Doe, J; Roe, R")
    assert(row.getAs[String]("publishers") == "LISSA Press")
    // subjects ∪ synonyms ∪ tags, |-split, dedup'd, sorted
    assert(row.getAs[String]("subjects") == "Methods,Open Science,Sociology")
    // 26-char stamp truncates to 19 + Z; rft-date to 10
    assert(row.getAs[String]("x_date") == "2023-05-06T01:02:03Z")
    assert(row.getAs[String]("date") == "2023-05-06")
    // 5-char abstract is under the detection threshold
    assert(row.getAs[String]("lang") == null)
    assert(row.getAs[String]("abstract") == "short")
  }

  test("DOI: only the dx prefix is stripped; first of several wins; none → null") {
    val out = is(Seq(
      doc(""""identifiers": ["https://doi.org/10.1/kept-whole"]"""),
      doc(""""identifiers": ["http://dx.doi.org/10.2/first",
           |"https://doi.org/10.3/second"]""".stripMargin
        .replaceAll("\n", "")),
      doc(""""identifiers": ["https://example.org/page"]""")))
      .select("doi").collect().map(_.getString(0))
    assert(out.toSeq == Seq(
      "https://doi.org/10.1/kept-whole", "10.2/first", null))
  }

  test("date fallback: published → created; neither drops (lenient) or throws (strict)") {
    val created =
      """{"id": "c1", "title": "T", "date_published": "",
        | "date_created": "2021-01-02T03:04:05"}""".stripMargin
        .replaceAll("\n", "")
    val dateless = """{"id": "c2", "title": "T"}"""
    val lenient = is(Seq(created, dateless))
      .select("local_id", "x_date").as[(String, String)].collect()
    assert(lenient.toSeq == Seq(("c1", "2021-01-02T03:04:05Z")))
    val e = intercept[Throwable](
      is(Seq(created, dateless), strict = true).collect())
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("c2"))
  }

  test("language detection: bibliographic codes, Han check, >20-char gate") {
    val de = "der die das und ist nicht von zu mit sich " * 2
    val out = is(Seq(
      doc(s""""description": "$de""""),
      doc(""""description": "the of and to in is that it was for sure""""),
      doc(""""description": "这是一个很长的中文描述文本，足够超过二十个字符了""""),
      doc(""""description": "xyzzy plugh abcdef ghijkl mnopqr stuvwx""""),
      doc(""""description": "的 short"""")))
      .select("lang").collect().map(_.getString(0))
    assert(out.toSeq == Seq("ger", "eng", "chi", "und", null))
  }

  test("ES response envelope unwraps hits.hits[]._source") {
    val resp =
      """{"took": 3, "hits": {"total": 2, "hits": [
        | {"_index": "lissa", "_source": {"id": "h1", "title": "One",
        |   "date_published": "2020-01-01T00:00:00"}},
        | {"_source": {"id": "h2", "title": "Two",
        |   "date_created": "2020-02-02T00:00:00"}}]}}""".stripMargin
        .replaceAll("\n", "")
    val out = Lissa.toIntermediate(
      Lissa.parseResponse(Seq(resp).toDF("resp_json"), "resp_json"))
      .select("local_id", "title").as[(String, String)].collect()
    assert(out.toSeq == Seq(("h1", "One"), ("h2", "Two")))
  }
}
