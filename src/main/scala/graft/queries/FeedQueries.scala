package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.normalize.{Base, Datacite, Dblp, Doaj, Jstor, Lissa, Oadoi, Perinorm, Zdb}

/** Registered queries for the DOAJ normalizer pipeline (parse →
  * ISSN-exclusion → title-dedup, sources/doaj.py:80-218), the JSTOR
  * ISSN→collection refinement (sources/jstor.py:618-788), and the
  * LISSA ES-hits normalizer (sources/lissa.py:98-180). Fixtures are
  * synthesized in-plan from `documents` (the s9/pipe4 pattern); mapping
  * dimensions are literal VALUES on both engines. */
object FeedQueries {

  // JSTOR mapping fixtures — cover every path: multi-name ISSN (3),
  // name without an AMSL-valid tcid (7 → Ghost), unmapped ISSNs.
  private val IssnNames = Seq(
    "ISSN-0" -> "JSTOR Arts & Sciences I",
    "ISSN-1" -> "JSTOR Business I",
    "ISSN-2" -> "JSTOR Music",
    "ISSN-3" -> "JSTOR Ireland",
    "ISSN-3" -> "JSTOR Business I",
    "ISSN-7" -> "JSTOR Ghost")
  private val JstorTcid = Seq(
    "JSTOR Arts & Sciences I" -> "sid-55-col-as1",
    "JSTOR Business I" -> "sid-55-col-bus1",
    "JSTOR Music" -> "sid-55-col-music",
    "JSTOR Ireland" -> "sid-55-col-ireland",
    "JSTOR Ghost" -> "sid-55-col-ghost")
  private val TcidMega = Seq(
    "sid-55-col-as1" -> "JSTOR Arts & Sciences I Archive",
    "sid-55-col-bus1" -> "JSTOR Business & Economics",
    "sid-55-col-music" -> "JSTOR Music Archive",
    "sid-55-col-ireland" -> "JSTOR Ireland")

  private val DoajExcludedIssns = Seq("ISSN-3", "ISSN-7")

  private def dim(s: SparkSession, rows: Seq[(String, String)],
                  c1: String, c2: String): DataFrame = {
    import s.implicits._
    rows.toDF(c1, c2)
  }

  private def sqlValues(rows: Seq[(String, String)]): String =
    rows.map { case (a, b) => s"('$a','$b')" }.mkString(", ")

  /** One DOAJ article-dump JSON string per documents row. Titles repeat
    * every 150 ids so the dedup stage has real work; ids ≡ 3,7 (mod 10)
    * carry excluded ISSNs. */
  private def doajJson: Column = {
    val id = col("doc_id")
    def s(c: Column): Column = c.cast("string")
    to_json(struct(
      concat(lit("doaj-"), s(id)).as("id"),
      concat(lit("2024-01-"), lpad(s(id % 28 + 1), 2, "0")).as("created_date"),
      struct(
        concat(lit("T"), s(id % 150)).as("title"),
        s(lit(2000) + id % 20).as("year"),
        when(id % 4 === 0, lit(null).cast("string"))
          .otherwise(s(id % 12 + 1)).as("month"),
        concat(lit("About "), col("lang")).as("abstract"),
        s(id % 30 + 1).as("start_page"),
        s(id % 30 + 3).as("end_page"),
        struct(
          concat(lit("Journal of "), col("source")).as("title"),
          concat(lit("Pub"), s(id % 5)).as("publisher"),
          array(upper(col("lang"))).as("language"),
          array(concat(lit("ISSN-"), s(id % 10)),
            concat(lit("EISSN-"), s(id % 10))).as("issns")).as("journal"),
        array(
          struct(lit("doi").as("type"),
            concat(lit("10.123/DOAJ."), s(id)).as("id")),
          struct(lit("pissn").as("type"),
            concat(lit("ISSN-"), s(id % 10)).as("id"))).as("identifier"),
        array(struct(concat(lit("A-"), s(id)).as("name"))).as("author"),
        array(concat(lit("k"), s(id % 4))).as("keywords"),
        array(struct(lit("fulltext").as("type"),
          concat(lit("https://doaj.example/"), s(id)).as("url"))).as("link")
      ).as("bibjson")))
  }

  /** One LISSA `_source` JSON per documents row, covering every branch
    * of the reference converter: ids ≡ 0 (mod 11) have no dx-DOI, ≡ 0
    * (mod 13) carry a second (https, unstripped) DOI, ≡ 0 (mod 7) have
    * a too-short abstract (no language detection), ≡ 0 (mod 5) fall
    * back from date_published to date_created, ≡ 0 (mod 85) have no
    * date at all (dropped), ≡ 0 (mod 6) have no publisher. Subjects,
    * synonyms and tags overlap (incl. a `|`-packed entry) so the
    * split-union-dedup has real work. */
  private def lissaJson: Column = {
    val id = col("doc_id")
    def s(c: Column): Column = c.cast("string")
    val none = typedLit(Seq.empty[String])
    val pageUrl = concat(lit("https://lissarchive.org/item/"), s(id))
    val dxDoi = concat(lit("http://dx.doi.org/10.31235/lissa."), s(id))
    val altDoi = concat(lit("https://doi.org/10.5555/alt."), s(id))
    val identifiers = concat(
      array(pageUrl),
      when(id % 11 =!= 0, array(dxDoi)).otherwise(none),
      when(id % 13 === 0, array(altDoi)).otherwise(none),
      array(concat(lit("oai:lissa:"), s(id))))
    val mm = lpad(s(id % 12 + 1), 2, "0")
    val dd = lpad(s(id % 28 + 1), 2, "0")
    to_json(struct(
      concat(lit("lissa-"), s(id)).as("id"),
      concat(lit("Preprint "), s(id)).as("title"),
      when(id % 7 === 0, lit("tiny")).otherwise(col("text"))
        .as("description"),
      array(concat(lit("C-"), s(id % 50)), concat(lit("D-"), s(id % 7)))
        .as("contributors"),
      when(id % 6 === 0, none)
        .otherwise(array(concat(lit("Pub"), s(id % 5)))).as("publishers"),
      identifiers.as("identifiers"),
      array(concat(lit("s"), s(id % 4), lit("|shared")),
        concat(lit("t"), s(id % 3))).as("subjects"),
      when(id % 2 === 0, array(concat(lit("s"), s(id % 4))))
        .otherwise(none).as("subject_synonyms"),
      array(lit("shared")).as("tags"),
      when(id % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("2023-"), mm, lit("-"), dd,
          lit("T10:11:12.345"))).as("date_published"),
      when(id % 5 === 0 && id % 17 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("2022-"), mm, lit("-01T00:00:00")))
        .as("date_created")))
  }

  /** Materialize the Unpaywall JSONL as a text-file fixture once per
    * (sf, version) — the reference's dump IS a file of lines
    * (ref: sources/oadoi.py:55-91), so pipe11 times the dump-scan
    * shape (read + typed from_json) rather than paying the wide
    * in-plan to_json synthesis (measured ~3-4 s of constant janino +
    * projection overhead) on every run. Same publish/race/cleanup
    * discipline as GraphQueries.ensureCitationFixture. */
  private val UnpaywallFixtureVersion = 1
  def ensureUnpaywallFixture(s: SparkSession, d: String): String = {
    import java.nio.file.Files
    val base = Fixtures.stampedDir(d, "documents", "unpaywall_jsonl",
      UnpaywallFixtureVersion)
    val target = base.resolve("dump")
    if (!Files.exists(target)) {
      val tmp = Files.createTempDirectory(base, "dump.part")
      try {
        val built = tmp.resolve("txt")
        Tables.documents(s, d).select(oadoiJson.as("value"))
          .coalesce(4).write.text(built.toString)
        Fixtures.publish(built, target)
      } finally Fixtures.deleteRecursively(tmp)
    }
    target.toString
  }

  /** One Unpaywall dump line per documents row. Branch coverage: ids ≡
    * 0 (mod 23) are corrupt JSON (the 2018-07-05 dump really shipped
    * one — parse must count, not crash), ≡ 0 (mod 19) lack a DOI, ≡ 0
    * (mod 29) have a null is_oa, ≡ 0 (mod 5) carry an uppercase DOI
    * (normalization under test); best_oa_location exists only on OA
    * rows and its license is null for ids ≡ 2 (mod 4). */
  private def oadoiJson: Column = {
    val id = col("doc_id")
    def s(c: Column): Column = c.cast("string")
    val isOa = id % 29 =!= 0 && id % 3 === 0
    val tail = when(id % 5 === 0, concat(lit("/DOC."), s(id)))
      .otherwise(concat(lit("/doc."), s(id)))
    val doi = concat(lit("10."), s(id % 7 + 1000), tail)
    val best = struct(
      concat(lit("https://repo.example/"), s(id)).as("url"),
      lit("repository").as("host_type"),
      when(id % 4 === 0, "cc-by").when(id % 4 === 1, "cc-by-nc")
        .when(id % 4 === 3, "cc0").as("license"),
      when(id % 2 === 0, "publishedVersion").otherwise("submittedVersion")
        .as("version"))
    when(id % 23 === 0, lit("{corrupt-line")).otherwise(to_json(struct(
      when(id % 19 =!= 0, doi).as("doi"),
      (lit(2000) + id % 25).cast("int").as("year"),
      lit("journal-article").as("genre"),
      when(id % 29 =!= 0, id % 3 === 0).as("is_oa"),
      concat(lit("Title "), s(id)).as("title"),
      concat(lit("https://doi.org/"), doi).as("doi_url"),
      concat(lit("Pub"), s(id % 5)).as("publisher"),
      (id % 6 === 0).as("journal_is_in_doaj"),
      array(struct(lit("A.").as("given"),
        concat(lit("Fam"), s(id % 40)).as("family"))).as("z_authors"),
      when(isOa, best).as("best_oa_location"),
      // slice-to-zero keeps the element type for the closed-access
      // rows' empty oa_locations (the dump ships `[]`, not null).
      when(isOa, array(best)).otherwise(slice(array(best), 1, 0))
        .as("oa_locations"))))
  }

  /** Materialize the BASE NDJSON dump fixture once per (sf, version) —
    * the reference's BaseFix consumes a tar-of-gzip NDJSON dump
    * (sources/base.py:141-160); the fixture is the post-extraction line
    * file. One line per documents row; branch coverage: ids ≡ 0 (mod 7)
    * have >4000-char titles, ≡ 0 (mod 2) a string author (long when ≡ 0
    * mod 14), odd ids a list author with an empty element (long when
    * ≡ 0 mod 21), ≡ 0 (mod 13/17) long author_sort/author_facet, id
    * padding `=` varies with id mod 3, publishDate cycles year-in-text /
    * no-year / ISO-prefix / absent, ≡ 0 (mod 5) carry the DE-15-FID
    * ISIL to rename. */
  private val BaseFixtureVersion = 1
  def ensureBaseFixture(s: SparkSession, d: String): String = {
    import java.nio.file.Files
    val base = Fixtures.stampedDir(d, "documents", "base_ndjson",
      BaseFixtureVersion)
    val target = base.resolve("dump")
    if (!Files.exists(target)) {
      val tmp = Files.createTempDirectory(base, "dump.part")
      try {
        val built = tmp.resolve("txt")
        Tables.documents(s, d).select(baseJson.as("value"))
          .coalesce(4).write.text(built.toString)
        Fixtures.publish(built, target)
      } finally Fixtures.deleteRecursively(tmp)
    }
    target.toString
  }

  private def baseJson: Column = {
    val id = col("doc_id")
    def s(c: Column): Column = c.cast("string")
    def long(prefix: Column, pad: String): Column =
      rpad(concat(prefix, lit("-")), 4100, pad)
    val title = when(id % 7 === 0, long(concat(lit("T"), s(id)), "x"))
      .otherwise(concat(lit("T-"), s(id), lit(" "), col("lang")))
    val common = Seq(
      concat(lit("base-ftx-"), s(id),
        when(id % 3 === 0, "").when(id % 3 === 1, "=").otherwise("=="))
        .as("id"),
      lit("marc").as("recordtype"),
      title.as("title"),
      concat(title, lit(" full")).as("title_full"),
      when(id % 11 =!= 0, concat(lit("S"), s(id))).as("title_short"),
      concat(lit("sort-"), s(id)).as("title_sort"),
      when(id % 13 === 0, long(concat(lit("as-"), s(id)), "s"))
        .otherwise(concat(lit("as-"), s(id))).as("author_sort"),
      array(concat(lit("af-"), s(id)),
        when(id % 17 === 0, long(concat(lit("af2-"), s(id)), "f"))
          .otherwise(lit(""))).as("author_facet"),
      when(id % 4 === 0, concat(lit("ca. "), s(lit(1900) + id % 120)))
        .when(id % 4 === 1, lit("[o.J.]"))
        .when(id % 4 === 2, concat(s(lit(1950) + id % 70), lit("-05")))
        .as("publishDate"),
      when(id % 5 === 0, array(lit("DE-15-FID"), lit("DE-14")))
        .otherwise(array(lit("DE-14"))).as("institution"))
    val authorStr = when(id % 14 === 0, long(concat(lit("Astr-"), s(id)), "a"))
      .otherwise(concat(lit("Astr-"), s(id))).as("author")
    val authorList = array(concat(lit("A1-"), s(id)), lit(""),
      when(id % 21 === 0, long(concat(lit("A2-"), s(id)), "b"))
        .otherwise(concat(lit("A2-"), s(id)))).as("author")
    when(id % 2 === 0, to_json(struct(common :+ (authorStr: Column): _*)))
      .otherwise(to_json(struct(common :+ (authorList: Column): _*)))
  }

  /** Materialize the Datacite OAI harvest fixture once per (sf,
    * version): one `<Record>` per documents row, the metha-cat
    * `Records/Record` shape (sources/datacite.py:74-82). Branch
    * coverage: ids ≡ 0 (mod 23) are deleted-header records (dropped),
    * ≡ 0 (mod 11) lack a DOI identifier, ≡ 0 (mod 19) lack a dc:type
    * (format falls back), ≡ 0 (mod 13) lack a date, ≡ 0 (mod 3) lack a
    * description, ≡ 7 (mod 10) carry an unmapped language, ≡ 0 (mod 4)
    * have no journal-shaped dc:source, ≡ 0 (mod 5) carry an ISSN
    * dc:source, ≡ 0 (mod 6) a non-URL non-DOI identifier. */
  private val DataciteFixtureVersion = 1
  def ensureDataciteFixture(s: SparkSession, d: String): String = {
    import java.nio.file.Files
    val base = Fixtures.stampedDir(d, "documents", "datacite_oai",
      DataciteFixtureVersion)
    val target = base.resolve("harvest")
    if (!Files.exists(target)) {
      val tmp = Files.createTempDirectory(base, "harvest.part")
      try {
        val built = tmp.resolve("xml")
        Tables.documents(s, d).select(dataciteRecordXml.as("value"))
          .coalesce(4).write.text(built.toString)
        Fixtures.publish(built, target)
      } finally Fixtures.deleteRecursively(tmp)
    }
    target.toString
  }

  private def dataciteRecordXml: Column = {
    val id = col("doc_id")
    def s(c: Column): Column = c.cast("string")
    def el(tag: String, body: Column): Column =
      concat(lit(s"<$tag>"), body, lit(s"</$tag>"))
    def opt(cond: Column, piece: Column): Column =
      when(cond, piece).otherwise(lit(""))
    val header = el("header",
      el("identifier", concat(lit("oai:datacite.example/"), s(id))))
    val issn = concat(lpad(s(id % 10000), 4, "0"), lit("-"),
      lpad(s(id % 1000), 3, "0"),
      when(id % 11 === 0, "X").otherwise(s(id % 10)))
    val dcType = element_at(typedLit(Seq("Monograph",
      "info:eu-repo/semantics/article", "Dataset", "Image")),
      (id % 4 + 1).cast("int"))
    val meta = el("metadata", el("oai_dc:dc", concat(
      el("dc:creator", concat(lit("C"), s(id), lit("-a"))),
      opt(id % 2 === 1, el("dc:creator", concat(lit("C"), s(id), lit("-b")))),
      opt(id % 3 =!= 0, el("dc:description", concat(lit("Abstract "), s(id)))),
      el("dc:language", when(id % 10 === 7, lit("xx")).otherwise(col("lang"))),
      opt(id % 11 =!= 0,
        el("dc:identifier", concat(lit("doi:10.5555/dc."), s(id)))),
      el("dc:identifier", concat(lit("https://example.org/r/"), s(id))),
      opt(id % 6 === 0, el("dc:identifier", concat(lit("hdl:123/"), s(id)))),
      el("dc:title", concat(lit("Title "), s(id))),
      opt(id % 13 =!= 0,
        el("dc:date", concat(lit("20"), lpad(s(id % 25), 2, "0"), lit("-03-15")))),
      opt(id % 4 =!= 0,
        el("dc:source", concat(lit("Journal of "), col("source"),
          lit("; Vol "), s(id % 20), lit(" ("), s(lit(1950) + id % 70),
          lit("); "), s(id % 30)))),
      opt(id % 5 === 0, el("dc:source", issn)),
      el("dc:publisher", concat(lit("Pub"), s(id % 5))),
      opt(id % 8 === 0, el("dc:publisher", concat(lit("Press"), s(id % 7)))),
      el("dc:subject", concat(lit("s"), s(id % 4), lit(", shared"))),
      el("dc:subject", concat(lit("t"), s(id % 3))),
      opt(id % 19 =!= 0, el("dc:type", dcType)))))
    when(id % 23 === 0,
        concat(lit("<Record><header status=\"deleted\">"),
          el("identifier", concat(lit("oai:datacite.example/"), s(id))),
          lit("</header></Record>")))
      .otherwise(concat(lit("<Record>"), header, meta, lit("</Record>")))
  }

  def all: Seq[Q] = Seq(

    // Datacite OAI harvest → IS (sources/datacite.py:55-120 +
    // assets/datacite/{flux.flux,morph.xml}): xmlstream Record split →
    // deleted-record filter → columnar morph (creators, language
    // lookup with raw fallback, http-identifier urls, format lookup
    // with flux default, b64url finc.id, ISSN/jtitle/volume from
    // dc:source, subject split, genre lookup, doi: strip). The oracle
    // re-derives every branch — including the base64url id — from the
    // documents table.
    Q("pipe16_datacite",
      """WITH b AS (SELECT doc_id AS d, lang, source FROM documents
        |           WHERE doc_id % 23 <> 0)
        |SELECT
        |  'oai:datacite.example/' || d AS record_id,
        |  'finc-datacite-' || rtrim(replace(replace(
        |     to_base64(encode('oai:datacite.example/' || d)),
        |     '+', '-'), '/', '_'), '=') AS finc_id,
        |  'datacite' AS source_id,
        |  'Datacite' AS mega_collection,
        |  CASE WHEN d % 19 = 0 THEN 'ElectronicArticle'
        |       ELSE CASE d % 4 WHEN 0 THEN 'Book'
        |                       WHEN 1 THEN 'ElectronicArticle'
        |                       WHEN 2 THEN 'ElectronicArticle'
        |                       ELSE 'Image' END END AS format,
        |  CASE WHEN d % 19 = 0 THEN NULL
        |       ELSE CASE d % 4 WHEN 0 THEN 'Book'
        |                       WHEN 1 THEN 'article' END END AS genre,
        |  'Title ' || d AS title,
        |  CASE WHEN d % 3 <> 0 THEN 'Abstract ' || d END AS abstract,
        |  'C' || d || '-a' ||
        |    CASE WHEN d % 2 = 1 THEN '|C' || d || '-b' ELSE '' END AS authors,
        |  CASE WHEN d % 10 = 7 THEN 'xx'
        |       ELSE CASE lang WHEN 'en' THEN 'eng' WHEN 'de' THEN 'ger'
        |                      WHEN 'es' THEN 'spa' WHEN 'fr' THEN 'fre'
        |                      WHEN 'zh' THEN 'chi' ELSE lang END
        |       END AS languages,
        |  'https://example.org/r/' || d AS url,
        |  CASE WHEN d % 13 <> 0
        |       THEN '20' || lpad(CAST(d % 25 AS VARCHAR), 2, '0') || '-03-15'
        |       END AS rdate,
        |  CASE WHEN d % 13 <> 0
        |       THEN '20' || lpad(CAST(d % 25 AS VARCHAR), 2, '0')
        |            || '-03-15T00:00:00Z' END AS xdate,
        |  CASE WHEN d % 5 = 0
        |       THEN lpad(CAST(d % 10000 AS VARCHAR), 4, '0') || '-'
        |            || lpad(CAST(d % 1000 AS VARCHAR), 3, '0')
        |            || CASE WHEN d % 11 = 0 THEN 'X'
        |                    ELSE CAST(d % 10 AS VARCHAR) END
        |       ELSE '' END AS issn,
        |  CASE WHEN d % 4 <> 0 THEN 'Journal of ' || source END AS jtitle,
        |  CASE WHEN d % 4 <> 0 THEN 'Vol ' || (d % 20) END AS volume,
        |  'Pub' || (d % 5) ||
        |    CASE WHEN d % 8 = 0 THEN '|Press' || (d % 7) ELSE '' END AS publishers,
        |  's' || (d % 4) || '|shared|t' || (d % 3) AS subjects,
        |  CASE WHEN d % 11 <> 0 THEN '10.5555/dc.' || d END AS doi
        |FROM b""".stripMargin) { (s, d) =>
      val recs = graft.sources.Xml.recordsFromFiles(
        s, ensureDataciteFixture(s, d), "Record")
      Datacite.toIntermediate(recs).select(
        col("`finc.record_id`").as("record_id"),
        col("`finc.id`").as("finc_id"),
        col("`finc.source_id`").as("source_id"),
        array_join(col("`finc.mega_collection`"), "|").as("mega_collection"),
        col("`finc.format`").as("format"),
        col("`rft.genre`").as("genre"),
        col("`rft.atitle`").as("title"),
        col("abstract"),
        array_join(transform(col("authors"), _.getField("rft.au")), "|")
          .as("authors"),
        array_join(col("languages"), "|").as("languages"),
        array_join(col("url"), "|").as("url"),
        col("`rft.date`").as("rdate"),
        col("`x.date`").as("xdate"),
        array_join(col("`rft.issn`"), "|").as("issn"),
        col("`rft.jtitle`").as("jtitle"),
        col("`rft.volume`").as("volume"),
        array_join(col("`rft.pub`"), "|").as("publishers"),
        array_join(col("`x.subjects`"), "|").as("subjects"),
        col("doi"))
    },

    // BASE on-the-fly fixes (sources/base.py:141-215): NDJSON dump scan
    // → whole-line ISIL rename → id/=-strip, recordtype override, 4000-
    // char truncation across the title/author families (incl. the
    // string-or-list author dispatch), 4-digit publishDate year
    // extraction. Pure projection — no shuffle; the oracle re-derives
    // every branch from the documents table.
    Q("pipe15_base",
      """WITH b AS (
        |  SELECT doc_id AS d, lang,
        |    CASE WHEN doc_id % 7 = 0 THEN rpad('T' || doc_id || '-', 4100, 'x')
        |         ELSE 'T-' || doc_id || ' ' || lang END AS title
        |  FROM documents)
        |SELECT 'base-ftx-' || d AS id,
        |  'default' AS recordtype,
        |  substr(title, 1, 4000) AS title,
        |  substr(title || ' full', 1, 4000) AS title_full,
        |  CASE WHEN d % 11 <> 0 THEN 'S' || d END AS title_short,
        |  'sort-' || d AS title_sort,
        |  CASE WHEN d % 2 = 0 THEN
        |    substr(CASE WHEN d % 14 = 0 THEN rpad('Astr-' || d || '-', 4100, 'a')
        |                ELSE 'Astr-' || d END, 1, 4000)
        |  ELSE 'A1-' || d || '||' ||
        |    substr(CASE WHEN d % 21 = 0 THEN rpad('A2-' || d || '-', 4100, 'b')
        |                ELSE 'A2-' || d END, 1, 4000)
        |  END AS author,
        |  (d % 2 = 1) AS author_is_list,
        |  substr(CASE WHEN d % 13 = 0 THEN rpad('as-' || d || '-', 4100, 's')
        |              ELSE 'as-' || d END, 1, 4000) AS author_sort,
        |  'af-' || d || '|' ||
        |    CASE WHEN d % 17 = 0
        |         THEN substr(rpad('af2-' || d || '-', 4100, 'f'), 1, 4000)
        |         ELSE '' END AS author_facet,
        |  CASE d % 4 WHEN 0 THEN CAST(1900 + d % 120 AS VARCHAR)
        |             WHEN 1 THEN '[o.J.]'
        |             WHEN 2 THEN CAST(1950 + d % 70 AS VARCHAR) END AS publish_date,
        |  CASE WHEN d % 5 = 0 THEN 'FID-MEDIEN-DE-15,DE-14'
        |       ELSE 'DE-14' END AS institution
        |FROM b""".stripMargin) { (s, d) =>
      Base.fix(s.read.text(ensureBaseFixture(s, d)))
        .select(col("id"), col("recordtype"), col("title"), col("title_full"),
          col("title_short"), col("title_sort"),
          array_join(col("author"), "|").as("author"),
          col("author_is_list"),
          col("author_sort"),
          array_join(col("author_facet"), "|").as("author_facet"),
          col("publish_date"),
          array_join(col("institution"), ",").as("institution"))
    },

    // ZDB: RDF Description XML → (short title → title) map with
    // lowercase twin keys and the Go tool's last-wins fold, expressed
    // as a max_by aggregation on record position. Records ≡ 0 (mod 11)
    // lack a shortTitle (skipped); ≡ 0 (mod 4) carry two titles (last
    // wins); ≡ 0 (mod 3) carry a second, mixed-case short title.
    Q("pipe12_zdb",
      """WITH recs AS (
        |  SELECT doc_id AS pos,
        |    CASE WHEN doc_id % 4 = 0 THEN 'T' || doc_id || 'b'
        |         ELSE 'T' || doc_id END AS t
        |  FROM documents WHERE doc_id % 11 <> 0),
        |shorts AS (
        |  SELECT pos, 'ZsT ' || (pos % 80) AS s, t FROM recs
        |  UNION ALL
        |  SELECT pos, 'Mix' || (pos % 40), t FROM recs WHERE pos % 3 = 0),
        |keys AS (
        |  SELECT pos, s AS k, t FROM shorts
        |  UNION ALL SELECT pos, lower(s), t FROM shorts)
        |SELECT k AS short, arg_max(t, pos) AS title
        |FROM keys GROUP BY k""".stripMargin) { (s, d) =>
      val id = col("doc_id")
      def str(c: Column): Column = c.cast("string")
      val shortTags = concat(
        when(id % 11 =!= 0,
          concat(lit("<shortTitle>ZsT "), str(id % 80),
            lit("</shortTitle>"))).otherwise(lit("")),
        when(id % 11 =!= 0 && id % 3 === 0,
          concat(lit("<shortTitle>Mix"), str(id % 40), lit("</shortTitle>")))
          .otherwise(lit("")))
      val titleTags = concat(
        lit("<title>T"), str(id), lit("</title>"),
        when(id % 4 === 0, concat(lit("<title>T"), str(id), lit("b</title>")))
          .otherwise(lit("")))
      val xml = concat(
        lit("<Description><issn>1234-567"), str(id % 10), lit("</issn>"),
        shortTags, titleTags, lit("</Description>"))
      val parsed = Zdb.parseDescriptions(
        Tables.documents(s, d).select(id.as("pos"), xml.as("xml")), "xml")
      Zdb.shortTitleMap(parsed, "pos")
    },

    // DBLP: the reference's QnD DOI-list pipeline (grep doi.org → strip
    // the https prefix/ee suffix → keep ^10), duplicates preserved.
    // Lines ≡ 0 (mod 3) are <title> rows (no doi.org), ≡ 1 (mod 9) are
    // dx.doi.org/http rows that survive the grep but fail ^10.
    Q("pipe13_dblp",
      """SELECT '10.1145/dblp.' || doc_id AS doi
        |FROM documents
        |WHERE doc_id % 3 <> 0 AND doc_id % 9 <> 1""".stripMargin) { (s, d) =>
      val id = col("doc_id")
      def str(c: Column): Column = c.cast("string")
      val line =
        when(id % 3 === 0,
          concat(lit("<title>Paper "), str(id), lit("</title>")))
        .when(id % 9 === 1,
          concat(lit("<ee>http://dx.doi.org/10.1145/dblp."), str(id),
            lit("</ee>")))
        .otherwise(
          concat(lit("<ee>https://doi.org/10.1145/dblp."), str(id),
            lit("</ee>")))
      Dblp.doiList(Tables.documents(s, d).select(line.as("line")), "line")
    },

    // OADOI/Unpaywall: JSONL dump → (doi, OA evidence) → x_oa flag join
    // onto a record stream by normalized DOI. Corrupt lines and DOI-less
    // rows fall out of the evidence list; unmatched records default to
    // x_oa = false; the evidence side broadcasts.
    Q("pipe11_oadoi",
      """SELECT 'rec-' || doc_id AS record_id,
        |  '10.' || (doc_id % 7 + 1000) || '/doc.' || doc_id AS doi,
        |  (doc_id % 23 <> 0 AND doc_id % 19 <> 0 AND doc_id % 29 <> 0
        |   AND doc_id % 3 = 0) AS x_oa,
        |  CASE WHEN doc_id % 23 <> 0 AND doc_id % 19 <> 0
        |            AND doc_id % 29 <> 0 AND doc_id % 3 = 0
        |       THEN 'https://repo.example/' || doc_id END AS oa_url,
        |  CASE WHEN doc_id % 23 <> 0 AND doc_id % 19 <> 0
        |            AND doc_id % 29 <> 0 AND doc_id % 3 = 0
        |       THEN CASE WHEN doc_id % 4 = 0 THEN 'cc-by'
        |                 WHEN doc_id % 4 = 1 THEN 'cc-by-nc'
        |                 WHEN doc_id % 4 = 3 THEN 'cc0' END
        |  END AS oa_license
        |FROM documents""".stripMargin) { (s, d) =>
      val id = col("doc_id")
      def str(c: Column): Column = c.cast("string")
      val evidence = Oadoi.bestOa(Oadoi.parse(
        s.read.text(ensureUnpaywallFixture(s, d)), "value"))
      val records = Tables.documents(s, d).select(
        concat(lit("rec-"), str(id)).as("record_id"),
        concat(lit("10."), str(id % 7 + 1000), lit("/doc."), str(id))
          .as("doi"))
      Oadoi.oaFlag(records, "doi", evidence)
        .select("record_id", "doi", "x_oa", "oa_url", "oa_license")
    },

    // Perinorm: NDJSON docs that are NOT intermediate schema get their
    // ISILs attached by a literal-map lookup on the FIRST collection
    // name — no join in the plan; the CASE on the oracle side renders
    // from the same attachment data. ids ≡ 4 (mod 6) carry a matching
    // name in position 2 (must NOT match); ≡ 5 have an empty
    // collection array (null institution, no crash).
    Q("pipe10_perinorm", {
      val keys = Perinorm.DefaultAttachments.map(_._1)
      val firstCase = keys.zipWithIndex
        .map { case (k, i) => s"WHEN $i THEN '$k'" }.mkString(" ")
      val instCase = Perinorm.DefaultAttachments.zipWithIndex
        .map { case ((_, isils), i) =>
          s"WHEN $i THEN '${isils.mkString(",")}'" }.mkString(" ")
      s"""SELECT 'peri-' || doc_id AS record_id,
         |  CASE doc_id % 6 $firstCase
         |    WHEN 4 THEN 'Other Collection' END AS first_collection,
         |  CASE doc_id % 6 $instCase END AS institution
         |FROM documents""".stripMargin
    }) { (s, d) =>
      val id = col("doc_id")
      def str(c: Column): Column = c.cast("string")
      val keys = Perinorm.DefaultAttachments.map(_._1)
      val firstKey = keys.zipWithIndex.foldLeft(lit(null).cast("string")) {
        case (acc, (k, i)) => when(id % 6 === i, lit(k)).otherwise(acc)
      }
      val mega = when(id % 6 === 4,
        array(lit("Other Collection"), lit(keys(2))))
        .when(id % 6 === 5, typedLit(Seq.empty[String]))
        .otherwise(array(firstKey))
      val docJson = to_json(struct(
        concat(lit("peri-"), str(id)).as("record_id"),
        concat(lit("Norm "), str(id)).as("title"),
        mega.as("mega_collection")))
      val parsed = Perinorm.parse(
        Tables.documents(s, d).select(docJson.as("line")), "line")
      Perinorm.attachInstitutions(parsed).select(
        col("doc")("record_id").as("record_id"),
        try_element_at(col("doc")("mega_collection"), lit(1))
          .as("first_collection"),
        array_join(col("institution"), ",").as("institution"))
    },

    // LISSA: ES `_source` JSON → IS with DOI extraction,
    // subject union/split/dedup, date fallback, and abstract language
    // detection through the engine's stopword-profile expression —
    // the profile lists render into the oracle from the same data.
    Q("pipe9_lissa",
      s"""WITH base AS (
         |  SELECT doc_id AS id,
         |    coalesce(CASE WHEN doc_id % 7 = 0 THEN 'tiny' ELSE text END,
         |             '') AS abstr
         |  FROM documents WHERE doc_id % 85 <> 0),
         |scored AS (
         |  SELECT *, greatest(h_en, h_de, h_fr, h_es) AS best FROM (
         |    SELECT id, abstr, has_han,
         |      ${LlmQueries.langHitsSql("en")} AS h_en,
         |      ${LlmQueries.langHitsSql("de")} AS h_de,
         |      ${LlmQueries.langHitsSql("fr")} AS h_fr,
         |      ${LlmQueries.langHitsSql("es")} AS h_es
         |    FROM (SELECT id, abstr,
         |      coalesce(regexp_matches(abstr, '\\p{Han}'), false) AS has_han,
         |      string_split(trim(abstr), ' ') AS toks FROM base))),
         |dated AS (
         |  SELECT *, CASE WHEN id % 5 = 0
         |      THEN printf('2022-%02d-01T00:00:00', id % 12 + 1)
         |      ELSE printf('2023-%02d-%02dT10:11:12.345',
         |                  id % 12 + 1, id % 28 + 1) END AS picked
         |  FROM scored)
         |SELECT 'ai-179-lissa-' || id AS record_id,
         |  '179' AS source_id,
         |  'lissa-' || id AS local_id,
         |  'Preprint' AS format,
         |  'article' AS genre,
         |  'EJOUR' AS ris_type,
         |  'LISSA,sid-179-col-lissa' AS mega_collection,
         |  'Preprint ' || id AS title,
         |  CASE WHEN id % 11 <> 0 THEN '10.31235/lissa.' || id
         |       WHEN id % 13 = 0 THEN 'https://doi.org/10.5555/alt.' || id
         |       END AS doi,
         |  'https://lissarchive.org/item/' || id
         |    || CASE WHEN id % 11 <> 0
         |            THEN ',http://dx.doi.org/10.31235/lissa.' || id
         |            ELSE '' END
         |    || CASE WHEN id % 13 = 0
         |            THEN ',https://doi.org/10.5555/alt.' || id
         |            ELSE '' END AS urls,
         |  'C-' || (id % 50) || '; D-' || (id % 7) AS authors,
         |  CASE WHEN id % 6 = 0 THEN '' ELSE 'Pub' || (id % 5) END
         |    AS publishers,
         |  abstr AS abstract,
         |  CASE WHEN length(abstr) > ${Lissa.MinDetectLen} THEN
         |    CASE WHEN has_han THEN 'chi'
         |         WHEN best = 0 THEN 'und'
         |         WHEN h_fr = best THEN 'fre' WHEN h_es = best THEN 'spa'
         |         WHEN h_en = best THEN 'eng' ELSE 'ger' END
         |    END AS lang,
         |  array_to_string(list_sort(list_distinct(
         |    ['s' || (id % 4), 'shared', 't' || (id % 3)])), ',') AS subjects,
         |  substr(picked, 1, 19) || 'Z' AS x_date,
         |  substr(picked, 1, 10) AS date
         |FROM dated""".stripMargin) { (s, d) =>
      Lissa.toIntermediate(Lissa.parse(
        Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(lissaJson.as("src_json")), "src_json"))
    },

    // DOAJ: parse → intermediate → ISSN exclusion (broadcast anti-join)
    // → newest-per-title dedup (window latest-per-key).
    Q("pipe6_doaj", {
      val excl = DoajExcludedIssns.map(i => s"'$i'").mkString(", ")
      s"""WITH base AS (
         |  SELECT doc_id AS id, lang, source FROM documents
         |  WHERE ('ISSN-' || (doc_id % 10)) NOT IN ($excl)),
         |v AS (
         |  SELECT id, lang, source,
         |    'ai-28-doaj-' || id AS record_id,
         |    'T' || (id % 150) AS title,
         |    printf('%04d-%02d-01', 2000 + id % 20,
         |      CASE WHEN id % 4 = 0 THEN 1 ELSE id % 12 + 1 END) AS date
         |  FROM base),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY title ORDER BY date DESC, record_id DESC) AS rn
         |  FROM v)
         |SELECT record_id, '28' AS source_id, 'ElectronicArticle' AS format,
         |  '10.123/doaj.' || id AS doi,
         |  title,
         |  'Journal of ' || source AS jtitle,
         |  'EISSN-' || (id % 10) || ',ISSN-' || (id % 10) AS issns,
         |  'Pub' || (id % 5) AS publisher,
         |  date,
         |  CASE lang WHEN 'en' THEN 'eng' WHEN 'de' THEN 'deu'
         |    WHEN 'fr' THEN 'fra' WHEN 'es' THEN 'spa' WHEN 'zh' THEN 'zho'
         |    ELSE 'eng' END AS lang,
         |  CAST(id % 30 + 1 AS VARCHAR) AS spage,
         |  CAST(id % 30 + 3 AS VARCHAR) AS epage,
         |  'A-' || id AS authors,
         |  'k' || (id % 4) AS keywords
         |FROM r WHERE rn = 1""".stripMargin
    }) { (s, d) =>
      val parsed = Doaj.parse(
        Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(doajJson.as("doc_json")), "doc_json")
      val is = Doaj.dedupByTitle(Doaj.excludeByIssn(
        Doaj.toIntermediate(parsed), DoajExcludedIssns))
      is.withColumn("issns", array_join(col("issns"), ","))
    },

    // JSTOR: per-record ISSN set → collection names → tcids → AMSL
    // validity → tcids + mega names; OA-URL fallback; untouched
    // otherwise. Every mapping join broadcasts.
    Q("pipe7_jstor_collections",
      s"""WITH base AS (SELECT doc_id AS id FROM documents),
         |rec_issn AS (
         |  SELECT id, 'ISSN-' || (id % 10) AS issn FROM base
         |  UNION
         |  SELECT id, 'ISSN-' || ((id + 3) % 10) FROM base WHERE id % 2 = 0),
         |issn_names(issn, name) AS (VALUES ${sqlValues(IssnNames)}),
         |jstor_tcid(name, tcid) AS (VALUES ${sqlValues(JstorTcid)}),
         |tcid_mega(tcid, mega) AS (VALUES ${sqlValues(TcidMega)}),
         |matched AS (
         |  SELECT DISTINCT r.id, t.tcid, m.mega
         |  FROM rec_issn r
         |  JOIN issn_names n ON r.issn = n.issn
         |  JOIN jstor_tcid t ON n.name = t.name
         |  JOIN tcid_mega m ON t.tcid = m.tcid),
         |agg AS (
         |  SELECT id, list_sort(list([tcid, mega])) AS tm
         |  FROM matched GROUP BY id),
         |named AS (
         |  SELECT DISTINCT r.id FROM rec_issn r
         |  JOIN issn_names n ON r.issn = n.issn)
         |SELECT 'ai-55-' || b.id AS rec_id,
         |  CASE
         |    WHEN a.tm IS NOT NULL THEN array_to_string(
         |      list_transform(a.tm, x -> x[1]) ||
         |      list_transform(a.tm, x -> x[2]), '; ')
         |    WHEN h.id IS NOT NULL THEN ''
         |    WHEN b.id % 5 = 0 THEN 'Open JSTOR Collection; sid-55-col-jstoropen'
         |    ELSE 'JSTOR'
         |  END AS collections
         |FROM base b
         |LEFT JOIN agg a ON b.id = a.id
         |LEFT JOIN named h ON b.id = h.id""".stripMargin) { (s, d) =>
      val id = col("doc_id")
      def str(c: Column): Column = c.cast("string")
      val records = Tables.documents(s, d).select(
        concat(lit("ai-55-"), str(id)).as("rec_id"),
        when(id % 2 === 0, array_distinct(array(
          concat(lit("ISSN-"), str(id % 10)),
          concat(lit("ISSN-"), str((id + 3) % 10)))))
          .otherwise(array(concat(lit("ISSN-"), str(id % 10)))).as("issns"),
        when(id % 5 === 0,
          array(concat(lit("https://www.jstor.org/stable/"), str(id + 10000))))
          .otherwise(array(concat(
            lit("https://www.jstor.org/stable/10.5250/xy."), str(id))))
          .as("urls"),
        array(lit("JSTOR")).as("collections"))
      Jstor.refineCollections(records, "rec_id", "issns", "urls", "collections",
          dim(s, IssnNames, "issn", "name"),
          dim(s, JstorTcid, "name", "tcid"),
          dim(s, TcidMega, "tcid", "mega"))
        .select(col("rec_id"), array_join(col("collections"), "; ").as("collections"))
    })
}
