package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.marc._
import graft.sources.Archives
import graft.functions.OpenUrl
import org.apache.spark.sql.functions._

/** S9 MARC codec + P7 predicate filter, S5/S6 archive scans, and the
  * F12 OpenURL builder. Fixtures are hand-authored (MARCXML is a public
  * standard; shapes follow sources/b3kat.py:190-202 semantics). */
class MarcSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def rec(id: String, ssgA: String, with912: Boolean): String = {
    val f912 =
      if (with912)
        """<datafield tag="912" ind1=" " ind2=" ">
          |  <subfield code="a">digit</subfield></datafield>""".stripMargin
      else ""
    s"""<record>
       |  <leader>00000nam a2200000 c 4500</leader>
       |  <controlfield tag="001">$id</controlfield>
       |  <datafield tag="084" ind1=" " ind2=" ">
       |    <subfield code="a">$ssgA</subfield>
       |    <subfield code="2">ssgn</subfield>
       |  </datafield>
       |  <datafield tag="245" ind1="1" ind2="0">
       |    <subfield code="a">Ein Titel</subfield>
       |  </datafield>
       |  $f912
       |</record>""".stripMargin
  }

  test("MARCXML decode: leader, controlfields, datafields, subfields") {
    val r = Marc.parseRecordXml(rec("b-1", "9,2", with912 = true))
    assert(r.leader.contains("nam"))
    assert(r.controlfields == Seq(MarcControlfield("001", "b-1")))
    assert(r.datafields.map(_.tag) == Seq("084", "245", "912"))
    assert(r.datafields.head.subfields
      == Seq(MarcSubfield("a", "9,2"), MarcSubfield("2", "ssgn")))
  }

  test("namespace-prefixed records parse identically") {
    val xml =
      """<marc:record xmlns:marc="http://www.loc.gov/MARC21/slim">
        |  <marc:leader>L</marc:leader>
        |  <marc:controlfield tag="001">x</marc:controlfield>
        |  <marc:datafield tag="084" ind1=" " ind2=" ">
        |    <marc:subfield code="a">9,2</marc:subfield>
        |  </marc:datafield>
        |</marc:record>""".stripMargin
    val r = Marc.parseRecordXml(xml)
    assert(r.controlfields.head.value == "x")
    assert(r.datafields.head.subfields.head.value == "9,2")
  }

  test("ISO 2709 round trip preserves every field, including multibyte UTF-8") {
    val orig = MarcRecord("00000nam a2200000 c 4500",
      Seq(MarcControlfield("001", "b-ü-1"), MarcControlfield("008", "220101s2022")),
      Seq(
        MarcDatafield("100", "1", " ", Seq(MarcSubfield("a", "Müller, Jürgen"))),
        MarcDatafield("245", "1", "0", Seq(
          MarcSubfield("a", "Größenordnungen"), MarcSubfield("b", "eine Übersicht"))),
        MarcDatafield("912", " ", " ", Seq(MarcSubfield("a", "digit")))))
    val bytes = Marc.encodeIso2709(orig)
    // leader digits: total record length and base address are coherent
    val total = new String(bytes.take(5), "UTF-8").toInt
    assert(total == bytes.length)
    assert(bytes.last == 0x1d.toByte)
    val back = Marc.decodeIso2709(bytes)
    assert(back.controlfields == orig.controlfields)
    assert(back.datafields == orig.datafields)
    // leader payload (bytes 5-11, 17-23) survives; lengths recomputed
    assert(back.leader.substring(5, 12) == "nam a22")
    // binary leg is stable: encode(decode(encode(x))) == encode(x)
    assert(Marc.encodeIso2709(back).sameElements(bytes))
  }

  test("ISO 2709 stream splits on leader length, not terminator bytes") {
    val r1 = Marc.encodeIso2709(MarcRecord("00000nam a2200000 c 4500",
      Seq(MarcControlfield("001", "a")), Nil))
    val r2 = Marc.encodeIso2709(MarcRecord("00000nam a2200000 c 4500",
      Seq(MarcControlfield("001", "b")),
      Seq(MarcDatafield("245", " ", " ", Seq(MarcSubfield("a", "T"))))))
    val recs = Marc.splitIso2709(r1 ++ r2).toSeq
    assert(recs.length == 2)
    assert(Marc.decodeIso2709(recs(0)).controlfields.head.value == "a")
    assert(Marc.decodeIso2709(recs(1)).controlfields.head.value == "b")
  }

  test("ISO 2709 dataset legs: XML → struct → binary → struct") {
    val xml = Seq(rec("b-1", "9,2", with912 = true),
      rec("b-2", "8,1", with912 = false))
    val ds = Marc.fromMarcXml(xml.toDF("xml"), "xml")
    val back = Marc.fromIso2709(Marc.toIso2709(ds))
    val pairs = back.select(Marc.controlValue("001"),
      try_element_at(Marc.values("245.a"), lit(1))).as[(String, String)]
      .collect().sortBy(_._1)
    assert(pairs.toSeq == Seq(("b-1", "Ein Titel"), ("b-2", "Ein Titel")))
  }

  test("ISO 2709 encode rejects fields over the format's digit limits") {
    val big = MarcRecord("", Seq(MarcControlfield("001", "x" * 10000)), Nil)
    assertThrows[IllegalArgumentException](Marc.encodeIso2709(big))
  }

  test("ISO 2709 encode rejects non-3-byte tags before corrupting the directory") {
    // a 2- or 4-char tag would shift every later 12-byte entry
    for (tag <- Seq("24", "2455", "", "24ü")) {
      assertThrows[IllegalArgumentException](Marc.encodeIso2709(
        MarcRecord("", Nil,
          Seq(MarcDatafield(tag, " ", " ", Seq(MarcSubfield("a", "v")))))))
      assertThrows[IllegalArgumentException](Marc.encodeIso2709(
        MarcRecord("", Seq(MarcControlfield(tag, "v")), Nil)))
    }
  }

  test("ISO 2709 stream split flags trailing junk, truncation, bad prefixes") {
    val rec1 = Marc.encodeIso2709(MarcRecord("00000nam a2200000 c 4500",
      Seq(MarcControlfield("001", "a")), Nil))
    // 1-4 trailing bytes: not silently dropped
    val junk = rec1 ++ "xy".getBytes("UTF-8")
    val itJunk = Marc.splitIso2709(junk)
    itJunk.next()
    assert(intercept[IllegalArgumentException](itJunk.hasNext)
      .getMessage.contains("trailing"))
    // record declares more bytes than remain: truncation with context
    val cut = rec1.dropRight(3)
    assert(intercept[IllegalArgumentException](
      Marc.splitIso2709(cut).next()).getMessage.contains("truncated"))
    // non-digit length prefix: contextual error, not NumberFormatException
    val bad = "ab123".getBytes("UTF-8") ++ rec1.drop(5)
    assert(intercept[IllegalArgumentException](
      Marc.splitIso2709(bad).next()).getMessage.contains("length prefix"))
  }

  test("ISO 2709: bad subfield codes refuse to encode; dirty bytes decode with context") {
    // empty / multibyte codes would silently shift value bytes on decode
    for (code <- Seq("", "ab", "ü"))
      assertThrows[IllegalArgumentException](Marc.encodeIso2709(
        MarcRecord("", Nil,
          Seq(MarcDatafield("245", " ", " ", Seq(MarcSubfield(code, "v")))))))
    // adjacent subfield delimiters (dirty feed) → contextual error,
    // not a raw StringIndexOutOfBoundsException
    val good = Marc.encodeIso2709(MarcRecord("00000nam a2200000 c 4500", Nil,
      Seq(MarcDatafield("245", " ", " ", Seq(MarcSubfield("a", "x"))))))
    val base = new String(good.slice(12, 17), "UTF-8").trim.toInt
    val dirty = good.clone()
    dirty(base + 3) = 0x1f.toByte // overwrite code byte with a delimiter
    val e = intercept[IllegalArgumentException](Marc.decodeIso2709(dirty))
    assert(e.getMessage.contains("245"))
  }

  test("P7 SSG filter keeps only 084.2=ssgn ∧ 084.a=9,2 ∧ 912.a=digit") {
    val xmls = Seq(
      rec("keep", "9,2", with912 = true),
      rec("wrong-ssg", "8,1", with912 = true),
      rec("no-912", "9,2", with912 = false)).toDF("xml")
    val ds = Marc.fromMarcXml(xmls, "xml")
    val kept = Marc.ssgFilter(ds, "9,2")
      .select(Marc.controlValue("001")).as[String].collect().toSeq
    assert(kept == Seq("keep"))
  }

  test("values() and collection split") {
    val coll = s"""<collection>${rec("a", "9,2", true)}${rec("b", "7", false)}</collection>"""
    val parts = Marc.splitCollection(coll)
    assert(parts.size == 2)
    val ds = Marc.fromMarcXml(parts.toDF("xml"), "xml")
    val titles = ds.select(Marc.values("245.a").as("t"))
      .as[Seq[String]].collect().flatten.toSet
    assert(titles == Set("Ein Titel"))
  }

  test("S5 zip member scan lists and reads members without extraction") {
    val dir = java.nio.file.Files.createTempDirectory("zips")
    val zipPath = dir.resolve("a.zip")
    val zout = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(zipPath))
    Seq("x/one.txt" -> "first", "x/two.txt" -> "second-longer").foreach {
      case (name, content) =>
        zout.putNextEntry(new java.util.zip.ZipEntry(name))
        zout.write(content.getBytes("UTF-8"))
        zout.closeEntry()
    }
    zout.close()
    val members = Archives.zipMembers(spark, dir.toString + "/*.zip")
    val got = members.select("member", "size").as[(String, Long)].collect().toSet
    assert(got == Set(("x/one.txt", 5L), ("x/two.txt", 13L)))
    val content = members.filter(col("member") === "x/one.txt")
      .select(col("content").cast("string")).as[String].head()
    assert(content == "first")
  }

  test("S6 gzip line scan with provenance") {
    val dir = java.nio.file.Files.createTempDirectory("gz")
    val p = dir.resolve("data.ldj.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(p))
    out.write("line1\nline2\n".getBytes("UTF-8")); out.close()
    val lines = Archives.gzipLines(spark, p.toString)
    assert(lines.select("line").as[String].collect().toSeq == Seq("line1", "line2"))
    assert(lines.select("path").as[String].head().endsWith("data.ldj.gz"))
  }

  test("F12 OpenURL builder: article KEV params") {
    val df = Seq((
      "article", "rec-1", "10.1/x", "A Title", "J Title", "2016-01-01",
      Seq("1672-5123"), Seq.empty[String], "16", "9", "1737-1740",
      Seq.empty[String], Seq("Pub"), Seq("zho")))
      .toDF("genre", "rid", "doi", "atitle", "jtitle", "date",
            "issns", "eissns", "vol", "iss", "pages", "places", "pubs", "langs")
      .withColumn("authors", array(struct(
        lit(null).cast("string").as("rft.au"),
        lit(null).cast("string").as("rft.aucorp"),
        lit("L").as("rft.aufirst"), lit("Wang").as("rft.aulast"))))
    val qs = df.select(OpenUrl.queryString(
      col("genre"), col("rid"), col("doi"), col("atitle"), col("jtitle"),
      col("date"), col("issns"), col("eissns"),
      lit(null).cast("array<string>"), col("vol"), col("iss"),
      col("pages"), col("places"), col("pubs"), col("langs"),
      col("authors"), lit("x")).as("qs")).as[String].head()
    val params = qs.split("&").map(_.split("=", 2))
      .map(kv => kv(0) -> java.net.URLDecoder.decode(kv(1), "UTF-8")).toMap
    assert(params("url_ver") == "Z39.88-2004")
    assert(params("rft.genre") == "article")
    assert(params("rft_id") == "info:doi/10.1/x")
    assert(params("rft.atitle") == "A Title")
    assert(params("rft.issn") == "1672-5123")
    assert(params("rft.aulast") == "Wang")
    assert(params("rft.language") == "zho")
    assert(!params.contains("rft.eissn"))
    // Reference semantics: a non-null (even empty) place list emits the
    // param (", ".join([]) == "") — openurl.py:66-67.
    assert(params("rft.place") == "")
  }

  test("F12 OpenURL builder: journal branch keeps common title, no genre param") {
    val df = Seq(("journal", "r3", "Annual Index", "Nature", Seq("0028-0836")))
      .toDF("genre", "rid", "atitle", "jtitle", "issns")
      .withColumn("empty", array().cast("array<string>"))
      .withColumn("authors", array().cast(
        "array<struct<`rft.au`:string,`rft.aucorp`:string,`rft.aufirst`:string,`rft.aulast`:string>>"))
    val qs = df.select(OpenUrl.queryString(
      col("genre"), col("rid"), lit(null), col("atitle"), col("jtitle"),
      lit(null), col("issns"), col("empty"), col("empty"), lit(null),
      lit(null), lit(null), lit(null).cast("array<string>"), col("empty"),
      col("empty"), col("authors"), lit(null).cast("string")).as("qs"))
      .as[String].head()
    val params = qs.split("&").map(_.split("=", 2))
      .map(kv => kv(0) -> java.net.URLDecoder.decode(kv(1), "UTF-8")).toMap
    // openurl.py:155-156: common rft.title (from atitle) + rft.issn only.
    assert(params("rft.title") == "Annual Index")
    assert(params("rft.issn") == "0028-0836")
    assert(!params.contains("rft.genre"))
    assert(!params.contains("rft_val_fmt"))
  }

  test("F12 OpenURL builder: book and journal dispatch") {
    val base = Seq(("book", "r2", null.asInstanceOf[String], "B Title"))
      .toDF("genre", "rid", "doi", "atitle")
      .withColumn("empty", array().cast("array<string>"))
      .withColumn("eissns", array(lit("2049-3630")))
      .withColumn("isbns", array(lit("978-3-16-148410-0")))
      .withColumn("authors", array().cast(
        "array<struct<`rft.au`:string,`rft.aucorp`:string,`rft.aufirst`:string,`rft.aulast`:string>>"))
    val qs = base.select(OpenUrl.queryString(
      col("genre"), col("rid"), col("doi"), col("atitle"), lit(null),
      lit(null), col("empty"), col("eissns"), col("isbns"), lit(null),
      lit(null), lit(null), lit(null).cast("array<string>"), col("empty"),
      col("empty"), col("authors"), lit(null).cast("string")).as("qs"))
      .as[String].head()
    val params = qs.split("&").map(_.split("=", 2))
      .map(kv => kv(0) -> java.net.URLDecoder.decode(kv(1), "UTF-8")).toMap
    assert(params("rft_val_fmt") == "info:ofi/fmt:kev:mtx:book")
    assert(params("rft.genre") == "book")
    assert(params("rft.btitle") == "B Title")
    assert(params("rft_id") == "r2") // no DOI → record id
    // openurl.py:86-90 — isbn from the isbn field, eissn separately.
    assert(params("rft.isbn") == "978-3-16-148410-0")
    assert(params("rft.eissn") == "2049-3630")
  }

  test("F12 OpenURL builder: proceeding keeps raw genre through article branch") {
    val df = Seq(("proceeding", "r4", "Proc Title"))
      .toDF("genre", "rid", "atitle")
      .withColumn("empty", array().cast("array<string>"))
      .withColumn("authors", array().cast(
        "array<struct<`rft.au`:string,`rft.aucorp`:string,`rft.aufirst`:string,`rft.aulast`:string>>"))
    def qsOf(genreCol: org.apache.spark.sql.Column) =
      df.select(OpenUrl.queryString(
        genreCol, col("rid"), lit(null), col("atitle"), lit(null),
        lit(null), col("empty"), col("empty"), col("empty"), lit(null),
        lit(null), lit(null), lit(null).cast("array<string>"), col("empty"),
        col("empty"), col("authors"), lit(null).cast("string")).as("qs"))
        .as[String].head()
    val params = qsOf(col("genre")).split("&").map(_.split("=", 2))
      .map(kv => kv(0) -> java.net.URLDecoder.decode(kv(1), "UTF-8")).toMap
    // Article-branch params, but the raw genre value (openurl.py:148).
    assert(params("rft.genre") == "proceeding")
    assert(params("rft.atitle") == "Proc Title")
    // A genre-less record takes the article branch with no genre param.
    val noGenre = qsOf(lit(null).cast("string")).split("&").map(_.split("=", 2))
      .map(kv => kv(0) -> java.net.URLDecoder.decode(kv(1), "UTF-8")).toMap
    assert(!noGenre.contains("rft.genre"))
    assert(noGenre("rft.atitle") == "Proc Title")
  }
}
