package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.normalize.Crossref

/** Golden tests for the Crossref works-message normalizer against
  * handwritten messages in the public REST-API shape
  * (ref: sources/crossref.py:217-242 span-import contract; the raw
  * message fields are visible in crossref.py's jq pipelines). */
class CrossrefSpec extends AnyFunSuite {
  import TestSpark.spark

  private val AsOf = java.time.LocalDate.of(2026, 1, 1)

  private def normalize(messages: Seq[String]): DataFrame = {
    import spark.implicits._
    Crossref.toIntermediate(Crossref.parse(
      messages.toDF("msg_json"), "msg_json"), AsOf)
  }

  private val fullMessage =
    """{"DOI": "10.1006/JMBI.1998.2354", "member": "78",
      | "type": "journal-article",
      | "title": ["Protein folding kinetics"],
      | "subtitle": ["a revised view"],
      | "container-title": ["Journal of Molecular Biology"],
      | "publisher": "Elsevier BV", "volume": "285", "issue": "4",
      | "page": "1735-1747",
      | "issn-type": [{"value": "0022-2836", "type": "print"},
      |               {"value": "1089-8638", "type": "electronic"}],
      | "issued": {"date-parts": [[1999, 2, 5]]},
      | "author": [{"given": "Alexei", "family": "Finkelstein",
      |             "sequence": "first"},
      |            {"name": "Structure Consortium", "sequence": "additional"}],
      | "license": [{"URL": "https://creativecommons.org/licenses/by/4.0/",
      |              "content-version": "vor", "delay-in-days": 0}],
      | "subject": ["Structural Biology", "Molecular Biology"],
      | "language": "en",
      | "URL": "http://dx.doi.org/10.1006/jmbi.1998.2354",
      | "abstract": "<jats:p>Folding is fast.</jats:p>"}""".stripMargin
      .replaceAll("\n", "")

  test("full record: every mapped field") {
    val r = normalize(Seq(fullMessage)).collect()(0)
    def f(n: String) = r.getAs[Any](n)
    // DOI lowercased before id synthesis (conversions.py:494)
    assert(f("doi") == "10.1006/jmbi.1998.2354")
    assert(f("record_id") == "ai-49-" +
      java.util.Base64.getUrlEncoder.withoutPadding
        .encodeToString("10.1006/jmbi.1998.2354".getBytes("UTF-8")))
    assert(f("source_id") == "49")
    assert(f("format") == "ElectronicArticle")
    assert(f("genre") == "article")
    assert(f("doc_type") == "journal-article")
    assert(f("prefix") == "10.1006")
    assert(f("title") == "Protein folding kinetics : a revised view")
    assert(f("jtitle") == "Journal of Molecular Biology")
    assert(f("issns") == "0022-2836")
    assert(f("eissns") == "1089-8638")
    assert(f("volume") == "285")
    assert(f("issue") == "4")
    assert(f("spage") == "1735")
    assert(f("epage") == "1747")
    assert(f("pages") == "1735-1747")
    assert(f("date") == "1999-02-05")
    assert(f("authors") == "Finkelstein, Alexei; Structure Consortium")
    assert(f("publisher") == "Elsevier BV")
    assert(f("url") == "http://dx.doi.org/10.1006/jmbi.1998.2354")
    assert(f("lang") == "eng")
    assert(f("subjects") == "Structural Biology,Molecular Biology")
    assert(f("abstract") == "Folding is fast.")
  }

  test("year-only date pads month/day; missing URL falls back to doi.org") {
    val msg =
      """{"DOI": "10.5555/x1", "title": ["T"], "type": "book",
        | "issued": {"date-parts": [[2001]]}}""".stripMargin.replaceAll("\n", "")
    val r = normalize(Seq(msg)).collect()(0)
    assert(r.getAs[String]("date") == "2001-01-01")
    assert(r.getAs[String]("url") == "https://doi.org/10.5555/x1")
    assert(r.getAs[String]("genre") == "book")
    // no language → reference default
    assert(r.getAs[String]("lang") == "eng")
    // no page / no author arrays → null (key-omitted in the IS), not ""
    assert(r.getAs[String]("spage") == null)
    assert(r.getAs[String]("authors") == null)
  }

  test("empty-string subtitle leaves no dangling separator") {
    val msg =
      """{"DOI": "10.5555/x9", "title": ["Plain"], "subtitle": [""],
        | "issued": {"date-parts": [[2001]]}}""".stripMargin
        .replaceAll("\n", "")
    assert(normalize(Seq(msg)).collect()(0).getAs[String]("title") == "Plain")
  }

  test("single page value sets spage without epage") {
    val msg =
      """{"DOI": "10.5555/x2", "title": ["T"], "page": "42",
        | "issued": {"date-parts": [[2001, 7]]}}""".stripMargin
        .replaceAll("\n", "")
    val r = normalize(Seq(msg)).collect()(0)
    assert(r.getAs[String]("spage") == "42")
    assert(r.getAs[String]("epage") == null)
    assert(r.getAs[String]("pages") == "42")
    assert(r.getAs[String]("date") == "2001-07-01")
    // unlisted type → document
    assert(r.getAs[String]("genre") == "document")
  }

  test("author without given still renders; family-less org uses name") {
    val msg =
      """{"DOI": "10.5555/x3", "title": ["T"],
        | "issued": {"date-parts": [[2010]]},
        | "author": [{"family": "Curie"}, {"name": "CERN"}]}""".stripMargin
        .replaceAll("\n", "")
    val r = normalize(Seq(msg)).collect()(0)
    assert(r.getAs[String]("authors") == "Curie; CERN")
  }

  test("rejects: missing doi, empty/blank title, implausible year") {
    val msgs = Seq(
      """{"title": ["No DOI"], "issued": {"date-parts": [[2000]]}}""",
      """{"DOI": "10.1/a", "title": [], "issued": {"date-parts": [[2000]]}}""",
      """{"DOI": "10.1/b", "title": ["  "], "issued": {"date-parts": [[2000]]}}""",
      """{"DOI": "10.1/c", "issued": {"date-parts": [[2000]]}}""",
      """{"DOI": "10.1/d", "title": ["Y1200"], "issued": {"date-parts": [[1200]]}}""",
      """{"DOI": "10.1/e", "title": ["Y3000"], "issued": {"date-parts": [[3000]]}}""",
      """{"DOI": "10.1/f", "title": ["No year"]}""",
      """{"DOI": "10.1/ok", "title": ["Fine"], "issued": {"date-parts": [[2000]]}}""")
    val out = normalize(msgs).select("doi").collect().map(_.getString(0))
    assert(out.toSeq == Seq("10.1/ok"))
  }

  test("year plausibility bound follows asOf, not wall-clock") {
    import spark.implicits._
    // Post-dated next-year issues are legitimate: asOf 2026 accepts
    // 2028 (year+2) and rejects 2029; asOf 2027 accepts 2029.
    def msg(doi: String, year: Int) =
      s"""{"DOI": "$doi", "title": ["T"], "issued": {"date-parts": [[$year]]}}"""
    val parsed = Crossref.parse(
      Seq(msg("10.1/a", 2028), msg("10.1/b", 2029)).toDF("msg_json"),
      "msg_json")
    def dois(asOf: java.time.LocalDate): Seq[String] =
      Crossref.toIntermediate(parsed, asOf)
        .select("doi").collect().map(_.getString(0)).toSeq.sorted
    assert(dois(java.time.LocalDate.of(2026, 6, 1)) == Seq("10.1/a"))
    assert(dois(java.time.LocalDate.of(2027, 6, 1)) ==
      Seq("10.1/a", "10.1/b"))
  }

  test("snapshot keeps the newest message per DOI by indexed timestamp") {
    import spark.implicits._
    def msg(doi: String, title: String, indexed: String) =
      s"""{"DOI": "$doi", "title": ["$title"],
         | "indexed": {"date-time": "$indexed"},
         | "issued": {"date-parts": [[2020]]}}""".stripMargin
        .replaceAll("\n", "")
    val snap = Crossref.snapshotLatest(Crossref.parse(Seq(
      msg("10.1/a", "old", "2023-01-01T00:00:00Z"),
      msg("10.1/a", "new", "2024-06-01T00:00:00Z"),
      msg("10.1/b", "only", "2022-01-01T00:00:00Z"))
      .toDF("msg_json"), "msg_json"))
    val out = Crossref.toIntermediate(snap, AsOf)
      .select("doi", "title").as[(String, String)].collect().toMap
    assert(out == Map("10.1/a" -> "new", "10.1/b" -> "only"))
  }

  test("snapshot collapses DOI case/URL variants of the same work") {
    import spark.implicits._
    def msg(doi: String, title: String, indexed: String) =
      s"""{"DOI": "$doi", "title": ["$title"],
         | "indexed": {"date-time": "$indexed"},
         | "issued": {"date-parts": [[2020]]}}""".stripMargin
        .replaceAll("\n", "")
    val snap = Crossref.snapshotLatest(Crossref.parse(Seq(
      msg("10.1/ABC", "stale-upper", "2023-01-01T00:00:00Z"),
      msg("https://doi.org/10.1/abc", "fresh-url-form", "2024-01-01T00:00:00Z"))
      .toDF("msg_json"), "msg_json"))
    val out = Crossref.toIntermediate(snap, AsOf)
      .select("doi", "title").as[(String, String)].collect()
    // one row, the newer variant, under the normalized doi
    assert(out.toSeq == Seq(("10.1/abc", "fresh-url-form")))
  }

  test("prefix mapping diff emits only drifted prefixes") {
    import spark.implicits._
    val is = normalize(Seq(fullMessage,
      """{"DOI": "10.9999/z", "title": ["Z"],
        | "issued": {"date-parts": [[2020]]}}""".stripMargin
        .replaceAll("\n", "")))
    val membersDf = Seq("10.1006" -> "Elsevier BV").toDF("prefix", "name")
    val currentDf = Seq(
      "10.1006" -> "Old Elsevier (CrossRef)",
      "10.9999" -> "UNDEFINED (CrossRef)").toDF("prefix", "current_collection")
    val diff = Crossref.prefixMappingDiff(is, membersDf, currentDf).collect()
    // 10.9999 canonical=UNDEFINED matches current → only 10.1006 drifts
    assert(diff.map(_.getString(0)).toSeq == Seq("10.1006"))
    assert(diff(0).getAs[String]("canonical_name") == "Elsevier BV")
  }
}
