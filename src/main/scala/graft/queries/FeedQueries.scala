package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.normalize.{Dblp, Doaj, Jstor, Lissa, Oadoi, Perinorm, Zdb}

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

  def all: Seq[Q] = Seq(

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
