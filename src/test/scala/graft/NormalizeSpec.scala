package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.normalize.{Base, Olc, Osf}
import graft.export.SolrExport
import graft.sources.Ndjson
import graft.core.Schema

/** Golden tests for the per-source normalizers (the shape of
  * test_conversions.py:59-300, with our own fixtures), the Solr export
  * mapping, and the NDJSON codec. */
class NormalizeSpec extends AnyFunSuite {
  import TestSpark.spark

  private def olcFixture: DataFrame = {
    val json = Seq(
      """{"id": "0-123", "title": ["Zur Geschichte der Philosophie"],
        | "title_sub": ["Ein Abriss"],
        | "abstract": ["Erster Teil."], "author2": ["Meier, Hans", "Schmidt, Eva"],
        | "format": ["electronic Article"],
        | "collection_details": ["SSG-OLC-PHI", "SSG-OLC-UNKNOWN", "FID-XYZ"],
        | "lang_code": ["ger"], "issn": ["1234-5678"],
        | "container_issue": "4", "container_title": "Zeitschrift für Philosophie",
        | "container_volume": "12", "publisher": ["Akademie Verlag"],
        | "url": ["https://example.org/a"], "publishDateSort": "1999"}""".stripMargin
        .replaceAll("\n", ""))
    import spark.implicits._
    spark.read.schema(Olc.InputSchema).json(json.toDS())
  }

  test("OLC: golden record") {
    val r = Olc.normalize(olcFixture).collect()(0)
    def f(n: String) = r.getAs[Any](n)
    assert(f("finc.id") == "ai-68-0-123")
    assert(f("finc.source_id") == "68")
    assert(f("finc.format") == "Article")
    assert(f("finc.mega_collection") == Seq("OLC SSG Philosophie"))
    assert(f("rft.atitle") == "Zur Geschichte der Philosophie")
    assert(f("x.subtitle") == "Ein Abriss")
    assert(f("abstract") == "Erster Teil.")
    assert(f("rft.issn") == Seq("1234-5678"))
    assert(f("rft.jtitle") == "Zeitschrift für Philosophie")
    assert(f("rft.issue") == "4")
    assert(f("rft.volume") == "12")
    assert(f("languages") == Seq("ger"))
    assert(f("x.date") == "1999-01-01T00:00:00Z")
    assert(f("rft.date") == "1999")
    assert(r.getAs[scala.collection.Seq[Row]]("authors").toSeq.map(_.getAs[String]("rft.au"))
      == Seq("Meier, Hans", "Schmidt, Eva"))
  }

  test("OLC: missing fields default; 5-digit year dropped") {
    import spark.implicits._
    val df = spark.read.schema(Olc.InputSchema)
      .json(Seq("""{"id": "9", "publishDateSort": "19999"}""").toDS())
    val r = Olc.normalize(df).collect()(0)
    assert(r.getAs[String]("finc.id") == "ai-68-9")
    assert(r.getAs[String]("rft.atitle") == "")
    assert(r.getAs[scala.collection.Seq[String]]("finc.mega_collection").toSeq == Seq.empty)
    // Unmapped default format "Article" maps to "Article".
    assert(r.getAs[String]("finc.format") == "Article")
    assert(r.getAs[String]("x.date") == null)
    assert(r.getAs[String]("rft.date") == null)
  }

  private def osfFixture: (DataFrame, DataFrame) = {
    import spark.implicits._
    val pre = spark.read.schema(Osf.InputSchema).json(Seq(
      """{"id": "egcsk",
        | "attributes": {"title": "A Study of the Data",
        |   "description": "We present the results of the analysis and the data.",
        |   "tags": ["data", "science"],
        |   "preprint_doi_created": "2020-05-04T10:20:30"},
        | "relationships": {"provider": {"data": {"id": "socarxiv"}}},
        | "links": {"preprint_doi": "https://doi.org/10.31235/osf.io/egcsk"}}"""
        .stripMargin.replaceAll("\n", "")).toDS())
    val contrib = spark.createDataFrame(
      Seq(("egcsk", 0, "Ada", "Lovelace"), ("egcsk", 1, "Alan", "Turing")))
      .toDF("preprint_id", "position", "given_name", "family_name")
    (pre, contrib)
  }

  test("OSF: golden record") {
    val (pre, contrib) = osfFixture
    val r = Osf.normalize(pre, contrib).collect()(0)
    def f(n: String) = r.getAs[Any](n)
    assert(f("finc.id") == "ai-179-egcsk")
    assert(f("finc.format") == "Preprint")
    assert(f("doi") == "10.31235/osf.io/egcsk")
    assert(f("finc.mega_collection") == Seq("sid-179-col-soc", "Socarxiv"))
    assert(f("rft.jtitle") == "socarxiv")
    assert(f("rft.atitle") == "A Study of the Data")
    assert(f("languages") == Seq("eng"))
    assert(f("x.date") == "2020-05-04T10:20:30Z")
    assert(f("rft.date") == "2020-05-04")
    assert(f("subjects") == Seq("data", "science"))
    assert(f("url") == Seq("https://doi.org/10.31235/osf.io/egcsk"))
    val authors = r.getAs[scala.collection.Seq[Row]]("authors").toSeq
    // Order is the API contributor order (position column), not
    // whatever collect_list happened to see.
    assert(authors.map(a => (a.getAs[String]("rft.aufirst"), a.getAs[String]("rft.aulast")))
      == Seq(("Ada", "Lovelace"), ("Alan", "Turing")))
  }

  test("OSF: unknown provider gets default tcid; no contributors -> empty authors") {
    import spark.implicits._
    val pre = spark.read.schema(Osf.InputSchema).json(Seq(
      """{"id": "zz", "attributes": {"title": "T"},
        | "relationships": {"provider": {"data": {"id": "novel"}}},
        | "links": {"preprint_doi": "https://doi.org/10.1/zz"}}"""
        .stripMargin.replaceAll("\n", "")).toDS())
    val contrib = spark.createDataFrame(Seq.empty[(String, Int, String, String)])
      .toDF("preprint_id", "position", "given_name", "family_name")
    val r = Osf.normalize(pre, contrib).collect()(0)
    assert(r.getAs[scala.collection.Seq[String]]("finc.mega_collection").toSeq
      == Seq("sid-179-col-novel", "Novel"))
    assert(r.getAs[scala.collection.Seq[Row]]("authors").toSeq == Seq.empty)
    assert(r.getAs[scala.collection.Seq[String]]("languages").toSeq == Seq("eng"))
    assert(r.getAs[String]("x.date") == null)
  }

  test("Solr export embeds the full record as JSON") {
    val (pre, contrib) = osfFixture
    val is = Osf.normalize(pre, contrib)
      .withColumn("x.labels", array(lit("DE-15")))
    val r = SolrExport.solr5vu3(is).collect()(0)
    assert(r.getAs[String]("id") == "ai-179-egcsk")
    assert(r.getAs[scala.collection.Seq[String]]("institution").toSeq == Seq("DE-15"))
    assert(r.getAs[String]("publishDateSort") == "2020")
    val full = r.getAs[String]("fullrecord")
    assert(full.contains("\"finc.id\":\"ai-179-egcsk\""))
    assert(r.getAs[scala.collection.Seq[String]]("author_facet").toSeq.toSet
      == Set("Lovelace, Ada", "Turing, Alan"))
    // widened facet set (solr5vu3 schema superset)
    assert(r.getAs[String]("format") == "Preprint") // finc.format pass-through
    assert(r.getAs[String]("publishDate") == "2020")
    assert(r.getAs[String]("access_facet") == "Electronic Resources")
    assert(r.getAs[scala.collection.Seq[String]]("facet_avail").toSeq
      == Seq("Online")) // x.oa unset → no Free facet
    assert(r.getAs[scala.collection.Seq[String]]("language").toSeq == Seq("eng"))
  }

  test("Solr export: OA flag adds the Free availability facet; containers map") {
    import spark.implicits._
    val is = graft.core.Schema.conform(Seq(
      ("ai-49-x", "49", "Some Title", "J of X", "12", "3", "100-110",
        "10.1/x", "2001-05-01", true))
      .toDF("finc.id", "finc.source_id", "rft.atitle", "rft.jtitle",
        "rft.volume", "rft.issue", "rft.pages", "doi", "rft.date", "x.oa"))
    val r = SolrExport.solr5vu3(is).collect()(0)
    assert(r.getAs[scala.collection.Seq[String]]("facet_avail").toSeq
      == Seq("Online", "Free"))
    assert(r.getAs[String]("container_volume") == "12")
    assert(r.getAs[String]("container_issue") == "3")
    assert(r.getAs[String]("container_pages") == "100-110")
    assert(r.getAs[String]("doi") == "10.1/x")
    assert(r.getAs[String]("publishDate") == "2001")
  }

  test("EastView: blob split + golden record + filters") {
    val blob =
      """<add>
        |  <doc>
        |    <field name="id">ev:001</field>
        |    <field name="title">О социологии</field>
        |    <field name="url">https://example.org/ev1</field>
        |    <field name="author">Иванов И.,Петров П.</field>
        |    <field name="source">Вопросы социологии</field>
        |    <field name="year">2005</field>
        |    <field name="pages">-</field>
        |    <field name="volume">7</field>
        |    <field name="language">rus</field>
        |    <field name="content">Длинный текст статьи</field>
        |  </doc>
        |  <doc>
        |    <field name="id">ev:002</field>
        |    <field name="url">https://example.org/no-title</field>
        |  </doc>
        |</add>""".stripMargin
    import spark.implicits._
    val rows = graft.normalize.EastView.explodeBlobs(
      spark, Seq(blob).toDF("xml"), "xml")
    assert(rows.count() == 2)
    val out = graft.normalize.EastView.normalize(rows).collect()
    assert(out.length == 1) // no-title doc dropped
    val r = out(0)
    assert(r.getAs[String]("finc.record_id") == "ev:001")
    assert(r.getAs[String]("finc.id").startsWith("ai-210-"))
    assert(!r.getAs[String]("finc.id").endsWith("="))
    assert(r.getAs[String]("rft.pages") == null) // "-" filtered
    assert(r.getAs[String]("rft.volume") == "7")
    assert(r.getAs[String]("x.date") == "2005-01-01T00:00:00Z")
    assert(r.getAs[String]("abstract").endsWith("..."))
    assert(r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("authors").size == 2)
    assert(r.getAs[scala.collection.Seq[String]]("languages").toSeq == Seq("rus"))
  }

  test("NDJSON round-trip: default codec is zstd when available, and the files on disk match it") {
    val (pre, contrib) = osfFixture
    val is = Osf.normalize(pre, contrib)
    val dir = java.nio.file.Files.createTempDirectory("ndjson").toString + "/out"
    Ndjson.write(is, dir)
    // The written extension must agree with the resolved default codec —
    // this is the "honest about zstd" gate: docs, probe, and bytes agree.
    val wantExt = Ndjson.DefaultCodec match {
      case "zstd" => ".zst"
      case other  => ".gz"
    }
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(wantExt)),
      s"default codec ${Ndjson.DefaultCodec} but files: ${files.mkString(",")}")
    val back = Ndjson.read(spark, is.schema, dir)
    assert(back.count() == 1)
    assert(back.select("`finc.id`").collect()(0).getString(0) == "ai-179-egcsk")
  }

  test("NDJSON explicit gzip still round-trips (pinned codec override)") {
    val (pre, contrib) = osfFixture
    val is = Osf.normalize(pre, contrib)
    val dir = java.nio.file.Files.createTempDirectory("ndjson-gz").toString + "/out"
    Ndjson.write(is, dir, compression = "gzip")
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".gz")), files.mkString(","))
    assert(Ndjson.read(spark, is.schema, dir).count() == 1)
  }

  test("IMSLP XML→MARC golden record (ref: test_conversions.py:9-44)") {
    val example =
      """<?xml version="1.0"?>
        |<document docID="imslpvalsskramstadhans">
        |  <localClass localClassName="col">imslp</localClass>
        |  <localClass localClassName="vifa">vifamusik</localClass>
        |  <identifier identifierEncodingSchema="originalID">valsskramstadhans</identifier>
        |  <creator>
        |    <mainForm>Skramstad, Hans</mainForm>
        |  </creator>
        |  <title>Vals for pianoforte</title>
        |  <subject>
        |    <mainForm>Romantic</mainForm>
        |  </subject>
        |  <music_arrangement_of>Piano</music_arrangement_of>
        |  <url urlEncodingSchema="originalDetailView">http://imslp.org/wiki/Vals_(Skramstad,_Hans)</url>
        |  <vifatype>Internetressource</vifatype>
        |</document>""".stripMargin
    val r = normalize.Imslp.xmlToMarc(example)
    def sub(tag: String, code: String): Seq[String] =
      r.datafields.filter(_.tag == tag)
        .flatMap(_.subfields.filter(_.code == code).map(_.value))
    assert(r.controlfields.find(_.tag == "001").map(_.value)
      .contains("finc-15-dmFsc3NrcmFtc3RhZGhhbnM"))
    assert(sub("100", "a") == Seq("Skramstad, Hans"))
    assert(sub("100", "e") == Seq("cmp"))
    assert(sub("245", "a") == Seq("Vals for pianoforte"))
    assert(sub("856", "u") == Seq("http://imslp.org/wiki/Vals_(Skramstad,_Hans)"))
    assert(sub("590", "a") == Seq("Romantic") && sub("590", "b") == Seq("Piano"))
    assert(sub("689", "a").toSet == Set("Romantic", "Piano"))
    assert(sub("980", "a") == Seq("valsskramstadhans") && sub("980", "b") == Seq("15"))
    // No languages element → no 008/041.
    assert(!r.controlfields.exists(_.tag == "008"))
    assert(!r.datafields.exists(_.tag == "041"))
    // Non-strict marcx semantics: falsy subfield values are dropped, so
    // no empty subfields and no 240 (no legacy mapping) anywhere.
    assert(r.datafields.forall(_.subfields.forall(_.value.nonEmpty)))
    assert(!r.datafields.exists(_.tag == "240"))
  }

  test("IMSLP conversion edge semantics: title required, unbekannt filtered, second-of-two subjects") {
    def doc(body: String) =
      s"""<document><identifier>idx</identifier>
         |<creator><mainForm>C</mainForm></creator>
         |<url>http://x</url>$body</document>""".stripMargin
    intercept[IllegalArgumentException] { normalize.Imslp.xmlToMarc(doc("")) }
    val r = normalize.Imslp.xmlToMarc(doc(
      """<title>T</title>
        |<languages>unbekannt</languages><languages>ger</languages>
        |<subject><mainForm>First</mainForm></subject>
        |<subject><mainForm>second thing</mainForm></subject>""".stripMargin))
    // unbekannt dropped; first remaining language drives 008.
    assert(r.controlfields.find(_.tag == "008").exists(_.value.contains("ger")))
    assert(r.datafields.filter(_.tag == "041").flatMap(_.subfields).map(_.value) == Seq("ger"))
    // Two subjects → the reference keeps the SECOND; Python .title().
    val s590 = r.datafields.find(_.tag == "590").get.subfields
    assert(s590.find(_.code == "a").map(_.value).contains("Second Thing"))
    // No arrangement → 590 carries no $b and the empty 689 is dropped.
    assert(!s590.exists(_.code == "b"))
    assert(r.datafields.count(_.tag == "689") == 1)
    // Dataset-level conversion runs through the codec boundary.
    import spark.implicits._
    val ds = normalize.Imslp.fromXml(
      Seq(doc("<title>T</title>")).toDF("xml"), "xml")
    assert(ds.count() == 1)
  }

  test("NDJSON permissive read surfaces corrupt lines") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ndjson2")
    val p = dir.resolve("data.json")
    java.nio.file.Files.writeString(p,
      """{"finc.id": "ok1"}
        |this is not json
        |{"finc.id": "ok2"}""".stripMargin)
    val df = Ndjson.readPermissive(spark, Schema.IntermediateSchema, p.toString).cache()
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
  }

  test("EastView: null and corrupt blobs skipped; id-less docs dropped") {
    import spark.implicits._
    val blobs = Seq(
      null.asInstanceOf[String],
      "<not xml",
      """<add><doc><field name="title">T</field>
        |<field name="url">u</field></doc>
        |<doc><field name="id">x1</field><field name="title">T2</field>
        |<field name="url">u2</field></doc></add>""".stripMargin)
      .toDF("xml")
    val rows = graft.normalize.EastView.explodeBlobs(spark, blobs, "xml")
    assert(rows.count() == 2) // two docs from the one good blob
    val out = graft.normalize.EastView.normalize(rows).collect()
    assert(out.length == 1) // id-less doc dropped
    assert(out(0).getAs[String]("finc.record_id") == "x1")
  }

  test("oadoi: corrupt and DOI-less lines drop; flag join defaults false") {
    import spark.implicits._
    import graft.normalize.Oadoi
    val lines = Seq(
      """{"doi": "10.1/A", "is_oa": true,
        | "best_oa_location": {"url": "u1", "license": "cc-by",
        | "version": "publishedVersion", "host_type": "repository"}}""",
      """{"doi": "10.1/b", "is_oa": false, "oa_locations": []}""",
      """{"doi": null, "is_oa": true}""", // DOI-less: dropped from list
      """{corrupt""", // the 2018-07-05 dump line: dropped, not thrown
      """{"doi": "10.1/c"}""" // null is_oa -> false
    ).map(_.stripMargin.replaceAll("\n", "")).toDF("line")
    val parsed = Oadoi.parse(lines, "line")
    assert(Oadoi.corruptLines(parsed).as[String].collect().toSeq ==
      Seq("{corrupt"))
    val list = Oadoi.doiOaList(parsed).as[(String, Boolean)].collect().toMap
    assert(list == Map("10.1/a" -> true, "10.1/b" -> false,
      "10.1/c" -> false)) // DOI normalized to lowercase
    val ev = Oadoi.bestOa(parsed)
    val records = Seq(("r1", "10.1/A"), ("r2", "10.1/b"), ("r3", "10.9/zz"),
      ("r4", null)).toDF("record_id", "doi")
    val flagged = Oadoi.oaFlag(records, "doi", ev)
      .select("record_id", "x_oa", "oa_url")
      .as[(String, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(flagged("r1") == ((true, Some("u1")))) // case-insensitive match
    assert(flagged("r2") == ((false, None)))
    assert(flagged("r3") == ((false, None))) // unmatched -> default
    assert(flagged("r4") == ((false, None))) // null DOI survives the join
  }

  test("Datacite: golden record, deleted filter, fallbacks") {
    import spark.implicits._
    import graft.normalize.Datacite
    val recs = Seq(
      """<Record><header><identifier>oai:datacite.org/1</identifier></header>
        |<metadata><oai_dc:dc>
        |<dc:creator>Ada L.</dc:creator><dc:creator>Alan T.</dc:creator>
        |<dc:description>An abstract.</dc:description>
        |<dc:language>en</dc:language><dc:language>xx</dc:language>
        |<dc:identifier>doi:10.5072/x.1</dc:identifier>
        |<dc:identifier>https://example.org/x1</dc:identifier>
        |<dc:identifier>hdl:11/1</dc:identifier>
        |<dc:title>The Title</dc:title>
        |<dc:date>2019-04-01</dc:date>
        |<dc:source>Intl J of Comm; Vol 5 (2011); 29</dc:source>
        |<dc:source>1932-8036</dc:source>
        |<dc:publisher>USC</dc:publisher>
        |<dc:subject>media, culture</dc:subject>
        |<dc:type>Monograph</dc:type>
        |</oai_dc:dc></metadata></Record>""".stripMargin.replaceAll("\n", ""),
      """<Record><header status="deleted"><identifier>oai:datacite.org/2</identifier></header></Record>""",
      // minimal: no type/date/doi/source — defaults and nulls
      """<Record><header><identifier>oai:datacite.org/3</identifier></header>
        |<metadata><oai_dc:dc><dc:title>T3</dc:title>
        |</oai_dc:dc></metadata></Record>""".stripMargin.replaceAll("\n", ""),
      // ISSN listed BEFORE the journal-shaped dc:source — the morph
      // applies its regexes to every value, so jtitle/volume must come
      // from the matching one, not the first
      """<Record><header><identifier>oai:datacite.org/4</identifier></header>
        |<metadata><oai_dc:dc><dc:title>T4</dc:title>
        |<dc:source>1932-8036</dc:source>
        |<dc:source>Intl J of Comm; Vol 5 (2011); 29</dc:source>
        |</oai_dc:dc></metadata></Record>""".stripMargin.replaceAll("\n", ""))
      .toDF("xml")
    val out = Datacite.toIntermediate(recs).collect()
    assert(out.length == 3) // deleted record dropped
    val r = out(0)
    def f(n: String) = r.getAs[Any](n)
    assert(f("finc.record_id") == "oai:datacite.org/1")
    assert(f("finc.id") == "finc-datacite-" +
      java.util.Base64.getUrlEncoder.withoutPadding
        .encodeToString("oai:datacite.org/1".getBytes("UTF-8")))
    assert(f("finc.source_id") == "datacite")
    assert(f("finc.format") == "Book")   // Monograph via formatliste
    assert(f("rft.genre") == "Book")     // Monograph via genre map
    assert(f("rft.atitle") == "The Title")
    assert(f("abstract") == "An abstract.")
    assert(r.getAs[scala.collection.Seq[Row]]("authors").map(_.getString(0))
      == Seq("Ada L.", "Alan T."))
    assert(f("languages") == Seq("eng", "xx")) // lookup + raw fallback
    assert(f("url") == Seq("https://example.org/x1"))
    assert(f("rft.date") == "2019-04-01")
    assert(f("x.date") == "2019-04-01T00:00:00Z")
    assert(f("rft.issn") == Seq("1932-8036"))
    assert(f("rft.jtitle") == "Intl J of Comm")
    assert(f("rft.volume") == "Vol 5")
    assert(f("rft.pub") == Seq("USC"))
    assert(f("x.subjects") == Seq("media", "culture"))
    assert(f("doi") == "10.5072/x.1")
    val m = out(1)
    assert(m.getAs[String]("finc.format") == "ElectronicArticle") // default
    assert(m.getAs[String]("rft.genre") == null)
    assert(m.getAs[String]("rft.date") == null)
    assert(m.getAs[String]("x.date") == null)
    assert(m.getAs[String]("doi") == null)
    assert(m.getAs[String]("rft.jtitle") == null)
    assert(m.getAs[scala.collection.Seq[String]]("rft.issn").toSeq == Seq.empty)
    val o = out(2) // ISSN-first ordering
    assert(o.getAs[String]("rft.jtitle") == "Intl J of Comm")
    assert(o.getAs[String]("rft.volume") == "Vol 5")
    assert(o.getAs[scala.collection.Seq[String]]("rft.issn").toSeq
      == Seq("1932-8036"))
  }

  test("BASE fixes: rename, id strip, truncation, author dispatch, year") {
    import spark.implicits._
    val big = "B" * 5000
    val lines = Seq(
      // string author, ISIL rename, id padding, year-in-text
      s"""{"id": "aWQx==", "recordtype": "marc", "title": "$big",
         | "title_short": "s1", "author": "$big",
         | "author_sort": "zz", "author_facet": ["$big", ""],
         | "publishDate": "ca. 1987 [?]",
         | "institution": ["DE-15-FID", "DE-14"]}""",
      // list author incl. empty + null elements, no-year date
      """{"id": "aWQy", "author": ["A", "", null, "B"],
        | "publishDate": "[o.J.]", "institution": ["DE-14"]}""",
      // author absent, publishDate absent
      """{"id": "aWQz", "title": "t3"}""",
      // bracketed STRING author (library anonymous-author convention):
      // starts with '[' but is not JSON — must take the string branch
      """{"id": "aWQ0", "author": "[Verfasser unbekannt]"}"""
    ).map(_.stripMargin.replaceAll("\n", "")).toDF("value")
    val out = Base.fix(lines).collect()
    def r(i: Int) = out(i)
    assert(r(0).getAs[String]("id") == "aWQx")
    assert(r(0).getAs[String]("recordtype") == "default")
    assert(r(0).getAs[String]("title").length == 4000)
    assert(r(0).getAs[String]("title_short") == "s1")
    assert(r(0).getAs[scala.collection.Seq[String]]("author").map(_.length) == Seq(4000))
    assert(r(0).getAs[Boolean]("author_is_list") == false)
    assert(r(0).getAs[scala.collection.Seq[String]]("author_facet").map(_.length) == Seq(4000, 0))
    assert(r(0).getAs[String]("publish_date") == "1987")
    assert(r(0).getAs[scala.collection.Seq[String]]("institution") ==
      Seq("FID-MEDIEN-DE-15", "DE-14"))
    assert(r(1).getAs[scala.collection.Seq[String]]("author") == Seq("A", "", null, "B"))
    assert(r(1).getAs[Boolean]("author_is_list") == true)
    assert(r(1).getAs[String]("publish_date") == "[o.J.]") // no year: as-is
    assert(r(2).getAs[scala.collection.Seq[String]]("author") == null)
    assert(r(2).getAs[Any]("author_is_list") == null)
    assert(r(2).getAs[String]("publish_date") == null)
    assert(r(2).getAs[String]("title") == "t3") // short: untouched
    assert(r(3).getAs[scala.collection.Seq[String]]("author")
      == Seq("[Verfasser unbekannt]"))
    assert(r(3).getAs[Boolean]("author_is_list") == false)
  }
}
