package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Scalars
import graft.normalize.Crossref

/** Registered queries for the Crossref normalizer (the engine half of
  * the reference's dominant feed — sources/crossref.py:217-242) and its
  * prefix→collection maintenance task (sources/crossref.py:577-680).
  *
  * The message fixture is synthesized in-plan from the `documents`
  * table (the s9 MARC pattern): each row becomes a works-message JSON
  * string via `to_json`, then flows through the REAL path —
  * `from_json(MessageSchema)` → validity filter → intermediate-schema
  * projection — so the oracle checks the entire serialize→parse→
  * normalize loop against directly-computed expectations. Reject rules
  * are exercised by construction: doc_id ≡ 0 (mod 83) drops the DOI,
  * ≡ 0 (mod 89) empties the title, ≡ 0 (mod 97) emits year 1200.
  */
object CrossrefQueries {

  /** Members-dump fixture: DOI prefix → canonical publisher name.
    * 10.1005/10.1006 are deliberately absent (UNDEFINED fallback). */
  private val MemberNames = Seq(
    "10.1000" -> "Alpha Press", "10.1001" -> "Beta Works",
    "10.1002" -> "Gamma Publishing", "10.1003" -> "Delta House",
    "10.1004" -> "Epsilon Media")

  /** Currently-configured collection per prefix (the AMSL side of the
    * mapping diff): 10.1001/10.1003 carry drifted legacy names and
    * 10.1006 drifted relative to its UNDEFINED canonical → 3 diff
    * rows; 10.1005 shows an UNDEFINED prefix that is NOT drifted. */
  private val CurrentCollections = Seq(
    "10.1000" -> "Alpha Press (CrossRef)",
    "10.1001" -> "Legacy Beta (CrossRef)",
    "10.1002" -> "Gamma Publishing (CrossRef)",
    "10.1003" -> "Legacy Delta (CrossRef)",
    "10.1004" -> "Epsilon Media (CrossRef)",
    "10.1005" -> "UNDEFINED (CrossRef)",
    "10.1006" -> "Sigma House (CrossRef)")

  private def members(s: SparkSession): DataFrame = {
    import s.implicits._
    MemberNames.toDF("prefix", "name")
  }

  private def currents(s: SparkSession): DataFrame = {
    import s.implicits._
    CurrentCollections.toDF("prefix", "current_collection")
  }

  /** One works-message JSON string per documents row. `version` varies
    * only the title (a " [v1]" suffix) and the indexed timestamp, so a
    * snapshot that picks the newer version is detectable field-for-field
    * while every other expectation stays shared with pipe4's oracle. */
  private def messageJson(version: Column = lit(0)): Column = {
    val id = col("doc_id")
    def s(c: Column): Column = c.cast("string")
    val toks = Scalars.tokens(col("text"))
    def tok(i: Int): Column = try_element_at(toks, lit(i))

    val prefix = concat(lit("10."), s(lit(1000) + id % 7))
    val doiStr = concat(prefix, lit("/graft."), s(id))

    val titleEntry = concat(lit("Study "), s(id), lit(" of "),
      tok(1), lit(" "), tok(2),
      when(version === 1, lit(" [v1]")).otherwise(lit("")))
    val subEntry = concat(lit("a "), tok(3), lit(" perspective"))

    val year = when(id % 97 === 0, lit(1200))
      .otherwise(lit(1990) + id % 35).cast("int")
    val month = (id % 12 + 1).cast("int")
    val day = (id % 28 + 1).cast("int")
    val dateParts = when(id % 3 === 0, array(array(year)))
      .when(id % 3 === 1, array(array(year, month, day)))
      .otherwise(array(array(year, month)))

    def issn(a: Int, b: Int): Column =
      concat(lpad(s((id * a) % 10000), 4, "0"), lit("-"),
        lpad(s((id * b) % 10000), 4, "0"))
    val issnPrint = struct(issn(7, 13).as("value"), lit("print").as("type"))
    val issnElec = struct(issn(11, 17).as("value"), lit("electronic").as("type"))
    val issnType = when(id % 2 === 0, array(issnPrint, issnElec))
      .otherwise(array(issnPrint))

    def person(g: String, f: String, seq: String): Column =
      struct(concat(lit(g), s(id)).as("given"),
        concat(lit(f), s(id)).as("family"),
        lit(null).cast("string").as("name"),
        lit(seq).as("sequence"))
    val org = struct(lit(null).cast("string").as("given"),
      lit(null).cast("string").as("family"),
      concat(lit("Org "), s(id)).as("name"),
      lit("additional").as("sequence"))
    val authors = when(id % 10 === 0,
        array(person("G", "F", "first"), person("H", "K", "additional"), org))
      .when(id % 2 === 0,
        array(person("G", "F", "first"), person("H", "K", "additional")))
      .otherwise(array(person("G", "F", "first")))

    val licEntry = struct(
      lit("https://creativecommons.org/licenses/by/4.0/").as("URL"),
      lit("vor").as("content-version"),
      (id % 400).cast("int").as("delay-in-days"))
    // slice(arr, 1, 0) = typed empty array without a cast-by-DDL-string
    val license = when(id % 5 < 2, array(licEntry))
      .otherwise(slice(array(licEntry), 1, 0))

    val spageN = id % 90 + 1
    val page = when(id % 4 === 0, s(spageN))
      .otherwise(concat(s(spageN), lit("-"), s(spageN + id % 30 + 1)))

    to_json(struct(
      when(id % 83 === 0, lit(null).cast("string")).otherwise(doiStr).as("DOI"),
      s(id % 20).as("member"),
      when(id % 5 === 0, "journal-article").when(id % 5 === 1, "book-chapter")
        .when(id % 5 === 2, "proceedings-article").when(id % 5 === 3, "book")
        .otherwise("dataset").as("type"),
      when(id % 89 === 0, slice(array(titleEntry), 1, 0))
        .otherwise(array(titleEntry)).as("title"),
      when(id % 3 === 0, array(subEntry))
        .otherwise(slice(array(subEntry), 1, 0)).as("subtitle"),
      array(concat(lit("Journal of "), col("source"))).as("container-title"),
      concat(lit("Publisher "), s(id % 20)).as("publisher"),
      s(id % 40 + 1).as("volume"),
      s(id % 12 + 1).as("issue"),
      page.as("page"),
      issnType.as("issn-type"),
      struct(dateParts.as("date-parts")).as("issued"),
      struct(concat(lit("2024-01-0"), s(version + 1), lit("T00:00:00Z"))
        .as("date-time")).as("indexed"),
      authors.as("author"),
      license.as("license"),
      array(concat(lit("Subj"), s(id % 7)),
        concat(lit("Area"), s(id % 3))).as("subject"),
      col("lang").as("language"),
      when(id % 6 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("https://doi.org/"), doiStr)).as("URL"),
      concat(lit("<jats:p>"), tok(1), lit(" "), tok(2), lit(" "), tok(3),
        lit("</jats:p>")).as("abstract")))
  }

  /** Materialize the message fixtures once per SF dir (stamped like
    * SourceQueries' archive fixtures): `single/` holds one v0 message
    * per document, `versioned/` holds v0+v1 pairs for the snapshot
    * query. The registered queries then READ the landed JSON-string
    * parquet — scan → from_json → normalize, the exact production
    * path — instead of re-synthesizing messages in-plan on every run
    * (fixture prep, not engine work; the synthesis also serializes
    * onto one core because an sf table is a single parquet split).
    * Bench pre-builds this in warmup. Returns (singleDir, versionedDir). */
  /** Bump when messageJson's synthesis logic changes — part of the
    * cache stamp, so stale materializations can't shadow an edit. */
  private val MessageFixtureVersion = 1

  def ensureMessageFixture(s: SparkSession, d: String): (String, String) = {
    import java.nio.file.Files
    val base = Fixtures.stampedDir(d, "documents", "xrmsg", MessageFixtureVersion)
    val single = base.resolve("single")
    val versioned = base.resolve("versioned")
    val pid = ProcessHandle.current().pid()
    if (!Files.exists(single)) {
      val tmp = base.resolve(s"single_tmp_$pid")
      Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(messageJson().as("msg_json"))
        .write.mode("overwrite").parquet(tmp.toString)
      Fixtures.publish(tmp, single)
    }
    if (!Files.exists(versioned)) {
      val tmp = base.resolve(s"versioned_tmp_$pid")
      Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(explode(array(lit(0), lit(1))).as("v"), col("doc_id"),
          col("text"), col("lang"), col("source"))
        .select(messageJson(col("v")).as("msg_json"))
        .write.mode("overwrite").parquet(tmp.toString)
      Fixtures.publish(tmp, versioned)
    }
    (single.toString, versioned.toString)
  }

  /** Pinned pipeline reference date: the oracle's fixture years are
    * deterministic (1990-2024 valid, 1200 invalid), so the registered
    * queries anchor Crossref's year-plausibility bound to a constant
    * date instead of wall-clock — reruns of the same binary produce
    * the same rows in any calendar year. */
  private val AsOf = java.time.LocalDate.of(2026, 1, 1)

  /** scan → typed parse → validity filter → projection: the span-import
    * path over landed messages. (No 24× re-parse risk from the many
    * `msg` field references: Spark 4's CollapseProject refuses to
    * inline non-cheap expressions referenced more than once.) */
  private def intermediate(s: SparkSession, d: String): DataFrame =
    Crossref.toIntermediate(Crossref.parse(
      s.read.parquet(ensureMessageFixture(s, d)._1), "msg_json"), AsOf)

  /** The shared arithmetic of the oracle side, as a DuckDB CTE. */
  private val OracleBase =
    """WITH base AS (
      |  SELECT doc_id AS id, lang, source,
      |         string_split(trim(text), ' ') AS toks
      |  FROM documents
      |  WHERE doc_id % 83 <> 0 AND doc_id % 89 <> 0 AND doc_id % 97 <> 0),
      |v AS (
      |  SELECT *,
      |    '10.' || (1000 + id % 7) AS prefix,
      |    '10.' || (1000 + id % 7) || '/graft.' || id AS doi,
      |    1990 + id % 35 AS yr,
      |    CASE WHEN id % 3 = 0 THEN 1 ELSE id % 12 + 1 END AS mo,
      |    CASE WHEN id % 3 = 1 THEN id % 28 + 1 ELSE 1 END AS dy,
      |    id % 90 + 1 AS sp,
      |    (id % 90 + 1) + (id % 30 + 1) AS ep
      |  FROM base)""".stripMargin

  /** The shared IS expectation list; `titleSuffix` is the only field
    * the message version changes (pipe8's snapshot must pick v1). */
  private def isSelectSql(titleSuffix: String): String =
    s"""
        |SELECT
        |  'ai-49-' || translate(rtrim(to_base64(encode(doi)), '='), '+/', '-_')
        |    AS record_id,
        |  '49' AS source_id,
        |  'ElectronicArticle' AS format,
        |  CASE id % 5 WHEN 0 THEN 'article' WHEN 1 THEN 'bookitem'
        |    WHEN 2 THEN 'proceeding' WHEN 3 THEN 'book'
        |    ELSE 'document' END AS genre,
        |  CASE id % 5 WHEN 0 THEN 'journal-article' WHEN 1 THEN 'book-chapter'
        |    WHEN 2 THEN 'proceedings-article' WHEN 3 THEN 'book'
        |    ELSE 'dataset' END AS doc_type,
        |  doi, prefix,
        |  'Study ' || id || ' of ' || toks[1] || ' ' || toks[2] || '$titleSuffix' ||
        |    CASE WHEN id % 3 = 0
        |      THEN ' : a ' || toks[3] || ' perspective' ELSE '' END AS title,
        |  'Journal of ' || source AS jtitle,
        |  lpad(CAST((id * 7) % 10000 AS VARCHAR), 4, '0') || '-' ||
        |    lpad(CAST((id * 13) % 10000 AS VARCHAR), 4, '0') AS issns,
        |  CASE WHEN id % 2 = 0 THEN
        |    lpad(CAST((id * 11) % 10000 AS VARCHAR), 4, '0') || '-' ||
        |    lpad(CAST((id * 17) % 10000 AS VARCHAR), 4, '0')
        |    ELSE '' END AS eissns,
        |  CAST(id % 40 + 1 AS VARCHAR) AS volume,
        |  CAST(id % 12 + 1 AS VARCHAR) AS issue,
        |  CAST(sp AS VARCHAR) AS spage,
        |  CASE WHEN id % 4 = 0 THEN NULL ELSE CAST(ep AS VARCHAR) END AS epage,
        |  CASE WHEN id % 4 = 0 THEN CAST(sp AS VARCHAR)
        |    ELSE sp || '-' || ep END AS pages,
        |  printf('%04d-%02d-%02d', yr, mo, dy) AS date,
        |  'F' || id || ', G' || id ||
        |    CASE WHEN id % 2 = 0 THEN '; K' || id || ', H' || id ELSE '' END ||
        |    CASE WHEN id % 10 = 0 THEN '; Org ' || id ELSE '' END AS authors,
        |  'Publisher ' || (id % 20) AS publisher,
        |  'https://doi.org/' || doi AS url,
        |  CASE lang WHEN 'en' THEN 'eng' WHEN 'de' THEN 'deu'
        |    WHEN 'fr' THEN 'fra' WHEN 'es' THEN 'spa' WHEN 'zh' THEN 'zho'
        |    ELSE 'eng' END AS lang,
        |  'Subj' || (id % 7) || ',Area' || (id % 3) AS subjects,
        |  toks[1] || ' ' || toks[2] || ' ' || toks[3] AS abstract,
        |  CASE id % 7 WHEN 0 THEN 'Alpha Press' WHEN 1 THEN 'Beta Works'
        |    WHEN 2 THEN 'Gamma Publishing' WHEN 3 THEN 'Delta House'
        |    WHEN 4 THEN 'Epsilon Media' ELSE 'UNDEFINED' END ||
        |    ' (CrossRef)' AS mega_collection
        |FROM v""".stripMargin

  def all: Seq[Q] = Seq(

    // The span-import analog end to end: synthesize message JSON,
    // parse with the typed schema, reject invalid records, project the
    // intermediate schema, attach mega_collection from the broadcast
    // members dimension. 483 of 500 sf0.01 docs survive the three
    // reject rules.
    Q("pipe4_crossref", OracleBase + isSelectSql("")) { (s, d) =>
      Crossref.withCollections(intermediate(s, d), members(s))
    },

    // The §3.2 lifecycle end to end (CrossrefUniqItems ∘
    // IntermediateSchema): every document arrives as TWO message
    // versions (v1 indexed later, title tagged " [v1]"); the snapshot
    // keeps the newest per DOI, then the same parse→normalize→collections
    // chain runs. The oracle expects exactly the v1 fields — a snapshot
    // picking the wrong version hash-fails.
    Q("pipe8_crossref_snapshot", OracleBase + isSelectSql(" [v1]")) { (s, d) =>
      val versioned = s.read.parquet(ensureMessageFixture(s, d)._2)
      val snap = Crossref.snapshotLatest(Crossref.parse(versioned, "msg_json"))
      Crossref.withCollections(Crossref.toIntermediate(snap, AsOf),
        members(s))
    },

    // CrossrefPrefixMapping ∘ Diff: distinct data prefixes × canonical
    // member name × configured collection, drifted rows only.
    Q("pipe5_crossref_prefix_diff", {
      def values(rows: Seq[(String, String)]): String =
        rows.map { case (p, n) => s"('$p','$n')" }.mkString(", ")
      OracleBase + s""",
        |seen AS (SELECT DISTINCT prefix FROM v),
        |members(prefix, name) AS (VALUES ${values(MemberNames)}),
        |amsl(prefix, current_collection) AS
        |  (VALUES ${values(CurrentCollections)})
        |SELECT s.prefix,
        |       coalesce(m.name, 'UNDEFINED') AS canonical_name,
        |       a.current_collection
        |FROM seen s
        |LEFT JOIN members m ON s.prefix = m.prefix
        |JOIN amsl a ON s.prefix = a.prefix
        |WHERE coalesce(m.name, 'UNDEFINED') || ' (CrossRef)'
        |      <> a.current_collection""".stripMargin
    }) { (s, d) =>
      Crossref.prefixMappingDiff(intermediate(s, d), members(s), currents(s))
    })
}
