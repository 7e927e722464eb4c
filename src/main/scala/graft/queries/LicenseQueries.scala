package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.license._

/** License tagging end-to-end (P8 + J3 + J4 + P11): filter-config
  * compiler → Catalyst predicates + broadcast KBART range joins →
  * `x.labels` attachment, exercised over synthetic "records" derived
  * from the orders table and oracle-checked in SQL. */
object LicenseQueries {
  import FilterExpr._

  /** Records: orders as pseudo intermediate-schema rows — source id =
    * order status, collection = priority, one synthetic ISSN per
    * customer bucket, record date = order date. */
  def records(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      col("o_orderstatus").as("source_id"),
      array(col("o_orderpriority")).as("collections"),
      array(concat(lit("ISSN-"), col("o_custkey") % 20)).as("issns"),
      array().cast("array<string>").as("subjects"),
      col("o_orderdate").as("rdate"))

  def recordCols: RecordCols = RecordCols(
    id = col("o_orderkey"), sourceId = col("source_id"),
    collections = col("collections"), issns = col("issns"),
    subjects = col("subjects"), date = col("rdate"))

  /** KBART h1: ISSN-0..9, coverage from 1995; even keys close end-1997,
    * odd keys open-ended. */
  def h1(s: SparkSession): DataFrame =
    s.range(0, 10).select(
      concat(lit("ISSN-"), col("id")).as("issn"),
      lit("1995-01-01").cast("date").as("date_first"),
      when(col("id") % 2 === 0, lit("1997-12-31").cast("date")).as("date_last"),
      lit(0).as("embargo_days"))

  /** KBART h2: ISSN-5..14, open range from 1992 with a one-year
    * embargo moving wall — carried as the raw KBART embargo_info
    * string "R1Y" and parsed in-plan ([[Kbart.parseEmbargo]] folds to
    * 365 at optimization time), so l1/l2/l3's oracles exercise the
    * parser end to end. */
  def h2(s: SparkSession): DataFrame =
    s.range(5, 15).select(
      concat(lit("ISSN-"), col("id")).as("issn"),
      lit("1992-01-01").cast("date").as("date_first"),
      lit(null).cast("date").as("date_last"),
      Kbart.embargoDays(lit("R1Y")).as("embargo_days"),
      Kbart.embargoMethod(lit("R1Y")).as("embargo_method"))

  val AsOf = "1998-06-01"

  private val holdingsSql =
    """h1 AS (SELECT 'ISSN-' || k AS issn,
      |              DATE '1995-01-01' AS dfrom,
      |              CASE WHEN k % 2 = 0 THEN DATE '1997-12-31' END AS dto
      |       FROM range(0, 10) t(k)),
      |h2 AS (SELECT 'ISSN-' || k AS issn, DATE '1992-01-01' AS dfrom
      |       FROM range(5, 15) t(k)),
      |r AS (SELECT o_orderkey, o_orderstatus AS sid, o_orderpriority AS coll,
      |             'ISSN-' || (o_custkey % 20) AS issn,
      |             CAST(o_orderdate AS DATE) AS rdate
      |      FROM orders),
      |f AS (SELECT r.*,
      |  EXISTS(SELECT 1 FROM h1 WHERE h1.issn = r.issn
      |         AND r.rdate >= h1.dfrom
      |         AND (h1.dto IS NULL OR r.rdate <= h1.dto)
      |         AND r.rdate <= DATE '1998-06-01') AS m1,
      |  EXISTS(SELECT 1 FROM h2 WHERE h2.issn = r.issn
      |         AND r.rdate >= h2.dfrom
      |         AND r.rdate <= DATE '1998-06-01' - INTERVAL 365 DAY) AS m2
      |  FROM r)""".stripMargin

  def all: Seq[Q] = Seq(

    // L1 — hand-written filter config: boolean tree over source /
    // collection plus two holdings range joins (amsl.py:1286-1343 shape).
    Q("l1_license_tag",
      s"""WITH $holdingsSql
         |SELECT o_orderkey, concat_ws(',',
         |  CASE WHEN sid IN ('O', 'F') AND coll IN ('1-URGENT', '2-HIGH')
         |       THEN 'ISIL-A' END,
         |  CASE WHEN (sid = 'F' AND m1) OR (coll = '5-LOW' AND m2)
         |       THEN 'ISIL-B' END) AS labels
         |FROM f""".stripMargin) { (s, d) =>
      val configs = Map(
        "ISIL-A" -> And(Seq(SourceIn(Seq("O", "F")),
                            CollectionIn(Seq("1-URGENT", "2-HIGH")))),
        "ISIL-B" -> Or(Seq(
          And(Seq(SourceIn(Seq("F")), Holdings(Seq("h1")))),
          And(Seq(CollectionIn(Seq("5-LOW")), Holdings(Seq("h2")))))))
      Licensing.tag(records(s, d), recordCols, configs,
          Map("h1" -> h1(s), "h2" -> h2(s)), AsOf)
        .select(col("o_orderkey"), array_join(col("x_labels"), ",").as("labels"))
    },

    // L2 — the full P8 path: AMSL discovery rows → 8-case dispatch →
    // compiled config → tagging (amsl.py:874-1361).
    Q("l2_amsl_case_tag",
      s"""WITH $holdingsSql
         |SELECT o_orderkey, concat_ws(',',
         |  CASE WHEN (sid = 'O' AND coll = '1-URGENT')
         |         OR (sid = 'F' AND coll = '2-HIGH' AND m1)
         |       THEN 'ISIL-X' END,
         |  CASE WHEN sid = 'P' AND m2 THEN 'ISIL-Y' END) AS labels
         |FROM f""".stripMargin) { (s, d) =>
      val rows = Seq(
        AmslRow("ISIL-X", "O", "1-URGENT"),
        AmslRow("ISIL-X", "F", "2-HIGH",
          linkToHoldingsFile = Some("h1"),
          evaluateHoldingsFileForLibrary = Some("yes")),
        AmslRow("ISIL-Y", "P", "3-MEDIUM",
          linkToContentFile = Some("h2")))
      val configs = AmslConfigBuilder.build(rows)
      Licensing.tag(records(s, d), recordCols, configs,
          Map("h1" -> h1(s), "h2" -> h2(s)), AsOf)
        .select(col("o_orderkey"), array_join(col("x_labels"), ",").as("labels"))
    },

    // P11 companion — drop mode (`span-tag -D`): only labeled records
    // survive.
    Q("l3_tag_drop_unlabeled",
      s"""WITH $holdingsSql
         |SELECT o_orderkey, concat_ws(',',
         |  CASE WHEN sid IN ('O', 'F') AND coll IN ('1-URGENT', '2-HIGH')
         |       THEN 'ISIL-A' END,
         |  CASE WHEN (sid = 'F' AND m1) OR (coll = '5-LOW' AND m2)
         |       THEN 'ISIL-B' END) AS labels
         |FROM f
         |WHERE (sid IN ('O', 'F') AND coll IN ('1-URGENT', '2-HIGH'))
         |   OR ((sid = 'F' AND m1) OR (coll = '5-LOW' AND m2))""".stripMargin) { (s, d) =>
      val configs = Map(
        "ISIL-A" -> And(Seq(SourceIn(Seq("O", "F")),
                            CollectionIn(Seq("1-URGENT", "2-HIGH")))),
        "ISIL-B" -> Or(Seq(
          And(Seq(SourceIn(Seq("F")), Holdings(Seq("h1")))),
          And(Seq(CollectionIn(Seq("5-LOW")), Holdings(Seq("h2")))))))
      Licensing.tag(records(s, d), recordCols, configs,
          Map("h1" -> h1(s), "h2" -> h2(s)), AsOf, dropUnlabeled = true)
        .select(col("o_orderkey"), array_join(col("x_labels"), ",").as("labels"))
    },

    // SURVEY §7.2's minimum end-to-end slice (AIDOIList,
    // workflows/ai.py:801-826): records → OA whitelist semi-join →
    // license-tag one ISIL (incl. holdings range joins) → keep rows
    // carrying the ISIL → project the DOI list. Every join broadcasts;
    // one scan of the records side.
    Q("pipe3_doilist",
      s"""WITH $holdingsSql
         |SELECT '10.1000/o' || o_orderkey AS doi FROM f
         |WHERE ((sid = 'F' AND m1) OR (coll = '5-LOW' AND m2))
         |  AND issn IN ('ISSN-0', 'ISSN-3', 'ISSN-6', 'ISSN-9',
         |               'ISSN-12', 'ISSN-15', 'ISSN-18')""".stripMargin) { (s, d) =>
      val configs = Map(
        "ISIL-B" -> Or(Seq(
          And(Seq(SourceIn(Seq("F")), Holdings(Seq("h1")))),
          And(Seq(CollectionIn(Seq("5-LOW")), Holdings(Seq("h2")))))))
      val oaIssns = s.range(0, 20, 3)
        .select(concat(lit("ISSN-"), col("id")).as("issn1"))
      val flagged = records(s, d)
        .withColumn("issn1", try_element_at(col("issns"), lit(1)))
        .join(broadcast(oaIssns), Seq("issn1"), "left_semi")
      Licensing.tag(flagged, recordCols, configs,
          Map("h1" -> h1(s), "h2" -> h2(s)), AsOf)
        .filter(array_contains(col("x_labels"), "ISIL-B"))
        .select(concat(lit("10.1000/o"), col("o_orderkey")).as("doi"))
    },

    // L5 — the production config path: FOLIO metadata-usage rows →
    // reduced dispatch (skip GOLD_OA_LISTE / non-AI shards /
    // evaluate=no, per-ISIL AND(source, holdings), download prefix,
    // consortium expand) → the same compile/tag spine as L1/L2
    // (workflows/ai.py:345-371; sources/folio.py:56-77;
    // sources/amsl.py:722-871). The skipped noise rows reference a
    // nonexistent holdings file — reaching the tag path at all proves
    // the dispatch dropped them.
    Q("l5_folio_tag",
      s"""WITH $holdingsSql
         |SELECT o_orderkey, concat_ws(',',
         |  CASE WHEN sid IN ('F', 'O') AND m1 THEN 'ISIL-F1' END,
         |  CASE WHEN sid = 'P' AND m2 THEN 'ISIL-F2' END,
         |  CASE WHEN sid = 'P' AND m2 THEN 'ISIL-F3' END) AS labels
         |FROM f""".stripMargin) { (s, d) =>
      val rows = Seq(
        FolioRow("ISIL-F1", "F", "1"),
        FolioRow("ISIL-F1", "O", "1"),
        // consortium group: expands to ISIL-F2 + ISIL-F3
        FolioRow("finc-G", "P", "2"),
        // noise the dispatch must drop:
        FolioRow("ISIL-F1", "F", "9", dokumentLabel = Some("GOLD_OA_LISTE")),
        FolioRow("ISIL-F1", "F", "9", shardLabel = Some("UBL-main")),
        FolioRow("ISIL-F1", "F", "9",
          evaluateHoldingsFileForLibrary = Some("no")))
      val configs = FolioConfigBuilder.build(rows, prefix = "h",
        expand = Map("finc-G" -> Seq("ISIL-F2", "ISIL-F3")))
      Licensing.tag(records(s, d), recordCols, configs,
          Map("h1" -> h1(s), "h2" -> h2(s)), AsOf)
        .select(col("o_orderkey"), array_join(col("x_labels"), ",").as("labels"))
    },

    // L4 — KBART embargo_info strings parsed in-plan, both wall
    // directions: R (rolling embargo, record must predate the wall)
    // and P (availability window, record must postdate it), plus the
    // blank-string no-embargo case (ref: sources/jstor.py:546-580
    // field 12; Kbart.parseEmbargo).
    Q("l4_kbart_embargo",
      """WITH h3 AS (
        |  SELECT 'ISSN-' || k AS issn,
        |    CASE WHEN k % 4 = 1 THEN 'P' ELSE 'R' END AS m,
        |    CASE k % 4 WHEN 0 THEN 365 WHEN 1 THEN 180
        |      WHEN 2 THEN 0 ELSE 90 END AS d
        |  FROM range(0, 20) t(k)),
        |r AS (SELECT o_orderkey, 'ISSN-' || (o_custkey % 20) AS issn,
        |             CAST(o_orderdate AS DATE) AS rdate FROM orders)
        |SELECT DISTINCT o_orderkey
        |FROM r JOIN h3 ON r.issn = h3.issn
        |WHERE rdate >= DATE '1992-01-01'
        |  AND ((m = 'P' AND date_diff('day', rdate, DATE '1998-06-01') <= d)
        |    OR (m = 'R' AND date_diff('day', rdate, DATE '1998-06-01') >= d))"""
        .stripMargin) { (s, d) =>
      val info = element_at(
        typedLit(Seq("R1Y", "P6M", "", "R90D")), (col("id") % 4 + 1).cast("int"))
      val h3 = s.range(0, 20).select(
        concat(lit("ISSN-"), col("id")).as("issn"),
        lit("1992-01-01").cast("date").as("date_first"),
        lit(null).cast("date").as("date_last"),
        Kbart.embargoDays(info).as("embargo_days"),
        Kbart.embargoMethod(info).as("embargo_method"))
      Licensing.holdingsEntitledIds(records(s, d), recordCols, h3, lit(AsOf))
        .withColumnRenamed("__rid", "o_orderkey")
    })
}
