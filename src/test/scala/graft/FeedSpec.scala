package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.normalize.{Doaj, Jstor}

/** Golden tests for the JSTOR collection refinement paths
  * (sources/jstor.py:618-788 semantics) and the DOAJ pipeline stages
  * (sources/doaj.py:80-218). */
class FeedSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val issnNames = Seq(
    "0001-0001" -> "JSTOR Arts & Sciences I",
    "0002-0002" -> "JSTOR Ghost").toDF("issn", "name")
  private val jstorTcid = Seq(
    "JSTOR Arts & Sciences I" -> "sid-55-col-as1",
    "JSTOR Ghost" -> "sid-55-col-ghost").toDF("name", "tcid")
  private val tcidMega = Seq(
    "sid-55-col-as1" -> "JSTOR Arts & Sciences I Archive").toDF("tcid", "mega")

  private def refine(rows: Seq[(String, Seq[String], Seq[String])]) =
    Jstor.refineCollections(
      rows.toDF("rec_id", "issns", "urls")
        .withColumn("collections", array(lit("JSTOR"))),
      "rec_id", "issns", "urls", "collections",
      issnNames, jstorTcid, tcidMega)
      .select("rec_id", "collections").as[(String, Seq[String])]
      .collect().toMap

  test("JSTOR: mapped ISSN yields tcids + mega names") {
    val out = refine(Seq(("r1", Seq("0001-0001"), Seq.empty)))
    assert(out("r1") ==
      Seq("sid-55-col-as1", "JSTOR Arts & Sciences I Archive"))
  }

  test("JSTOR: name without AMSL-valid tcid yields empty collections") {
    val out = refine(Seq(("r2", Seq("0002-0002"),
      Seq("https://www.jstor.org/stable/12345"))))
    // named-but-invalid beats the OA fallback (reference order)
    assert(out("r2") == Seq.empty)
  }

  test("JSTOR: unmapped + OA-shaped URL falls back to Open JSTOR") {
    val out = refine(Seq(
      ("r3", Seq("9999-9999"), Seq("https://www.jstor.org/stable/26167842")),
      ("r4", Seq("9999-9999"),
        Seq("https://www.jstor.org/stable/10.5250/femigermstud.35.0147"))))
    assert(out("r3") == Jstor.OpenJstorCollections)
    // non-OA URL → original collections untouched
    assert(out("r4") == Seq("JSTOR"))
  }

  private def doajIs(rows: Seq[String]) =
    Doaj.toIntermediate(Doaj.parse(rows.toDF("doc_json"), "doc_json"))

  test("DOAJ: field mapping incl. doi pick, issn sort, month default") {
    val json =
      """{"id": "abc", "bibjson": {"title": "A Study",
        | "year": "2015",
        | "journal": {"title": "J", "publisher": "P",
        |   "language": ["EN"], "issns": ["2222-2222", "1111-1111"]},
        | "identifier": [{"type": "pissn", "id": "1111-1111"},
        |                {"type": "doi", "id": "10.5/ABC"}],
        | "author": [{"name": "Ada"}, {"name": "Bob"}],
        | "keywords": ["x"]}}""".stripMargin.replaceAll("\n", "")
    val r = doajIs(Seq(json)).collect()(0)
    assert(r.getAs[String]("record_id") == "ai-28-abc")
    assert(r.getAs[String]("doi") == "10.5/abc")
    assert(r.getAs[scala.collection.Seq[String]]("issns").toSeq ==
      Seq("1111-1111", "2222-2222"))
    assert(r.getAs[String]("date") == "2015-01-01")
    assert(r.getAs[String]("lang") == "eng")
    assert(r.getAs[String]("authors") == "Ada; Bob")
  }

  test("DOAJ: exclusion drops any record carrying a listed ISSN") {
    val mk = (id: String, issn: String) =>
      s"""{"id": "$id", "bibjson": {"title": "T", "year": "2000",
         | "journal": {"issns": ["$issn", "0000-0000"]}}}"""
        .stripMargin.replaceAll("\n", "")
    val is = doajIs(Seq(mk("a", "1111-1111"), mk("b", "2222-2222")))
    val kept = Doaj.excludeByIssn(is, Seq("1111-1111"))
      .select("record_id").as[String].collect()
    assert(kept.toSeq == Seq("ai-28-b"))
  }

  test("DOAJ: dirty year strings survive (try_cast) and undated loses dedup") {
    val mk = (id: String, yr: String, t: String) =>
      s"""{"id": "$id", "bibjson": {"title": "$t", $yr
         | "journal": {"issns": []}}}""".stripMargin.replaceAll("\n", "")
    val is = doajIs(Seq(
      mk("dirty", """"year": "2015?",""", "X"), // non-numeric year → null date
      mk("dated", """"year": "2001",""", "X")))
    // no crash under ANSI, and the dated record must WIN the dedup
    // (a null date sorts last, never beats a real one)
    val kept = Doaj.dedupByTitle(is)
      .select("record_id").as[String].collect()
    assert(kept.toSeq == Seq("ai-28-dated"))
    val dirtyDate = is.filter(col("record_id") === "ai-28-dirty")
      .select("date").collect()(0).getString(0)
    assert(dirtyDate == null)
  }

  test("DOAJ: title dedup keeps newest date, id-tiebroken") {
    val mk = (id: String, y: String, t: String) =>
      s"""{"id": "$id", "bibjson": {"title": "$t", "year": "$y",
         | "journal": {"issns": []}}}""".stripMargin.replaceAll("\n", "")
    val is = doajIs(Seq(
      mk("a1", "2001", "X"), mk("a2", "2005", "X"),
      mk("b1", "2003", "Y"), mk("b2", "2003", "Y")))
    val kept = Doaj.dedupByTitle(is)
      .select("record_id").as[String].collect().sorted
    assert(kept.toSeq == Seq("ai-28-a2", "ai-28-b2"))
  }

  private def periDocs(megas: Seq[Seq[String]]) = {
    import graft.normalize.Perinorm
    val rows = megas.zipWithIndex.map { case (m, i) =>
      s"""{"record_id": "p$i", "title": "T",
         | "mega_collection": [${m.map(x => s""""$x"""").mkString(",")}]}"""
        .stripMargin.replaceAll("\n", "")
    }
    Perinorm.attachInstitutions(
      Perinorm.parse(rows.toDF("line"), "line"))
  }

  test("Perinorm: institution attaches by FIRST collection name only") {
    val out = periDocs(Seq(
      Seq("Perinorm (DIN-Normen)"),
      Seq("Other Collection", "Perinorm (ISO Standards)"), // [1] ignored
      Seq("Perinorm (DWA-Regelwerk)", "Perinorm (DIN-Normen)"),
      Seq.empty)) // reference would crash; we null out
      .select(col("doc")("record_id"), col("institution"))
      .as[(String, Option[Seq[String]])].collect().toMap
    assert(out("p0").contains(Seq("DE-Gla1", "DE-Zi4")))
    assert(out("p1").isEmpty)
    assert(out("p2").contains(Seq("DE-Gla1")))
    assert(out("p3").isEmpty)
  }

  test("Perinorm: NDJSON re-emission omits institution for unmatched docs") {
    val json = periDocs(Seq(
      Seq("Perinorm (ISO Standards)"), Seq("Other Collection")))
      .select(to_json(struct(
        col("doc")("record_id").as("record_id"),
        col("institution"))).as("j"))
      .as[String].collect()
    assert(json(0).contains(""""institution":["DE-Gla1"]"""))
    assert(!json(1).contains("institution")) // untouched, Python parity
  }

  test("zdb: last-wins fold with lowercase twin keys; titleless skipped") {
    import graft.normalize.Zdb
    val recs = Seq(
      (1L, "<Description><shortTitle>Zs A</shortTitle>" +
        "<title>Old</title><title>Mid</title></Description>"),
      (2L, "<Description><shortTitle>Zs A</shortTitle>" +
        "<shortTitle>Zs B</shortTitle><title>New</title></Description>"),
      (3L, "<Description><issn>1-1</issn><title>NoShort</title></Description>"),
      (4L, "<Description><shortTitle>zs a</shortTitle>" +
        "<title>Lower</title></Description>")
    ).toDF("pos", "xml")
    val m = Zdb.shortTitleMap(Zdb.parseDescriptions(recs, "xml"), "pos")
      .as[(String, String)].collect().toMap
    // Record 2 overwrites record 1 for "Zs A"; record 4 overwrites the
    // lowercase twin only; record 1's two titles fold to the last.
    assert(m == Map(
      "Zs A" -> "New", "zs a" -> "Lower", "Zs B" -> "New", "zs b" -> "New"))
  }

  test("dblp: doi pipeline strips https form only, keeps duplicates") {
    import graft.normalize.Dblp
    val lines = Seq(
      "<ee>https://doi.org/10.1/x</ee>",
      "<ee>https://doi.org/10.1/x</ee>", // duplicate kept
      "<ee>http://dx.doi.org/10.1/y</ee>", // greps, fails ^10
      "<title>doi.org in prose</title>", // greps, fails ^10
      "<ee>https://example.com/z</ee>" // no doi.org
    ).toDF("line")
    val out = Dblp.doiList(lines, "line").as[String].collect().toSeq
    assert(out == Seq("10.1/x", "10.1/x"))
  }
}
