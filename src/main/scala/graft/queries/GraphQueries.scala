package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph.Citations

/** Registered queries for the citation edge-list family
  * ([[graft.graph.Citations]], ref: sources/oci.py). The edge fixture
  * renders from `lineitem`: each line cites (order → part), DOIs carry
  * a 7-way registrant prefix so self-citation has real structure, and
  * the Spark side goes through the raw CSV dump shape (header lines,
  * blank lines, short rows) while the oracle builds the clean relation
  * directly — the parse filter is exactly the part under test. */
object GraphQueries {

  /** SQL edge relation: citing DOI from the order, cited DOI from the
    * part, prefixes `10.1000`–`10.1006`. Raw duplicates are kept, as in
    * the reference dump. */
  private val EdgeSql =
    """edges AS (
      |  SELECT '10.' || (l_orderkey % 7 + 1000) || '/O' || l_orderkey AS citing,
      |         '10.' || (l_partkey % 7 + 1000) || '/P' || l_partkey AS cited
      |  FROM lineitem)""".stripMargin

  /** The dump lines: one CSV row per lineitem edge plus injected
    * header/junk lines that [[Citations.fromCsvLines]] must drop. */
  private def dumpLines(s: SparkSession, d: String): DataFrame = {
    def doi(prefixOf: Column, tag: String, key: Column): Column =
      concat(lit("10."), (prefixOf % 7 + 1000).cast("string"),
        lit("/" + tag), key.cast("string"))
    val line = concat(
      lit("oci:"), col("l_orderkey").cast("string"),
      lit("-"), col("l_partkey").cast("string"), lit(","),
      doi(col("l_orderkey"), "O", col("l_orderkey")), lit(","),
      doi(col("l_partkey"), "P", col("l_partkey")),
      lit(",2023-01-01,P1Y"))
    val junk = Seq(
      "oci,citing,cited,creation,timespan", // header (grep -vF target)
      "", // blank line
      "oci:broken-row") // too few fields
    import s.implicits._
    Tables.lineitem(s, d).select(line.as("line"))
      .unionAll(junk.toDF("line"))
  }

  /** Materialize the dump as a text-file fixture once per (sf, builder
    * version) — the reference's OCISingleFile IS a file of lines, so
    * the g-queries then time the real dump-scan shape (read + parse)
    * instead of re-synthesizing the CSV in-plan on every query. Built
    * lazily by the queries and eagerly by Bench's (untimed) prep;
    * concurrent builders race safely through [[Fixtures.publish]]
    * (line ORDER may differ between builds, content as a set does
    * not — every consumer is order-insensitive). */
  private val CitationFixtureVersion = 1
  def ensureCitationFixture(s: SparkSession, d: String): String = {
    import java.nio.file.Files
    val base = Fixtures.stampedDir(d, "lineitem", "oci_dump",
      CitationFixtureVersion)
    val target = base.resolve("dump")
    if (!Files.exists(target)) {
      val tmp = Files.createTempDirectory(base, "dump.part")
      // finally, not success-path-only: a failed write would otherwise
      // leak the dump.part* dir under the stamped base across runs.
      try {
        val built = tmp.resolve("txt")
        dumpLines(s, d).coalesce(4).write.text(built.toString)
        Fixtures.publish(built, target)
      } finally Fixtures.deleteRecursively(tmp)
    }
    target.toString
  }

  private[graft] def edgesFromDump(s: SparkSession, d: String): DataFrame =
    Citations.fromCsvLines(
      s.read.text(ensureCitationFixture(s, d)), "value")

  def all: Seq[Q] = Seq(

    // Dump parse: header/junk filtering + field cut. Raw duplicate
    // edges survive (dedup is downstream), so the oracle keeps them too.
    Q("g1_citation_edges",
      s"""WITH $EdgeSql
         |SELECT citing, cited FROM edges""".stripMargin) { (s, d) =>
      edgesFromDump(s, d)
    },

    // Unique citing list (ref: sources/oci.py:132-151) — projection +
    // one hash-distinct, no global sort.
    Q("g2_citing_unique",
      s"""WITH $EdgeSql
         |SELECT DISTINCT citing FROM edges""".stripMargin) { (s, d) =>
      Citations.citingUnique(edgesFromDump(s, d))
    },

    // All DOIs either side (ref: sources/oci.py:176-196): union before
    // the distinct — one shuffle, not three.
    Q("g3_all_dois",
      s"""WITH $EdgeSql
         |SELECT DISTINCT doi FROM (
         |  SELECT citing AS doi FROM edges
         |  UNION ALL SELECT cited FROM edges)""".stripMargin) { (s, d) =>
      Citations.allDoisUnique(edgesFromDump(s, d))
    },

    // In-degree top-100: map-side-combinable count + TakeOrdered (never
    // a global sort), DOI tie-break for a deterministic cut.
    Q("g4_most_cited",
      s"""WITH $EdgeSql
         |SELECT cited, count(*) AS n_citations FROM edges
         |GROUP BY cited ORDER BY n_citations DESC, cited LIMIT 100"""
        .stripMargin) { (s, d) =>
      Citations.mostCited(edgesFromDump(s, d), 100)
    },

    // Co-citation pairs: cited works sharing a citing work, >= 2 shared
    // citers. Pair generation is ONE aggregation per citing doc with a
    // 64-reference hub cap — mirrored in the oracle's HAVING.
    Q("g5_cocitation",
      s"""WITH $EdgeSql,
         |e AS (SELECT DISTINCT citing, cited FROM edges),
         |ok AS (SELECT citing FROM e GROUP BY citing
         |       HAVING count(*) BETWEEN 2 AND 64)
         |SELECT x.cited AS a, y.cited AS b, count(*) AS n_shared
         |FROM e x JOIN e y ON x.citing = y.citing AND x.cited < y.cited
         |JOIN ok ON x.citing = ok.citing
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin) { (s, d) =>
      Citations.coCitedPairs(edgesFromDump(s, d), minShared = 2,
        maxReferences = 64)
    },

    // Bibliographic coupling: citing works sharing >= 3 references —
    // the transpose, with the heavily-cited-hub cap binding for real
    // (parts are cited by ~30 orders at sf0.1).
    Q("g6_coupling",
      s"""WITH $EdgeSql,
         |e AS (SELECT DISTINCT citing, cited FROM edges),
         |ok AS (SELECT cited FROM e GROUP BY cited
         |       HAVING count(*) BETWEEN 2 AND 64)
         |SELECT x.citing AS a, y.citing AS b, count(*) AS n_shared
         |FROM e x JOIN e y ON x.cited = y.cited AND x.citing < y.citing
         |JOIN ok ON x.cited = ok.cited
         |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin) { (s, d) =>
      Citations.couplingPairs(edgesFromDump(s, d), minShared = 3,
        maxCiters = 64)
    },

    // Fixed-iteration PageRank (2 rounds, d=0.85, dangling mass
    // ignored on both sides), in exact integer mass units: float-sum
    // ordering differs between engines and flips exact-tie exports
    // (observed on 3/16743 rows at ppm precision), while integer
    // div/sum is bit-exact everywhere. The vertex-keyed join/agg per
    // iteration is the plan under test.
    Q("g8_pagerank",
      s"""WITH $EdgeSql,
         |e AS (SELECT DISTINCT citing, cited FROM edges),
         |v AS (SELECT DISTINCT doi FROM (
         |  SELECT citing AS doi FROM e UNION ALL SELECT cited FROM e)),
         |deg AS (SELECT citing, count(*) AS deg FROM e GROUP BY 1),
         |r1 AS (
         |  SELECT v.doi, 150000000 + (85 * coalesce(i.inflow, 0)) // 100
         |    AS mass
         |  FROM v LEFT JOIN (
         |    SELECT cited AS doi, sum(1000000000 // deg) AS inflow
         |    FROM e JOIN deg USING (citing) GROUP BY 1) i USING (doi)),
         |r2 AS (
         |  SELECT v.doi, 150000000 + (85 * coalesce(i.inflow, 0)) // 100
         |    AS mass
         |  FROM v LEFT JOIN (
         |    SELECT e.cited AS doi, sum(r1.mass // deg.deg) AS inflow
         |    FROM e JOIN deg USING (citing) JOIN r1 ON e.citing = r1.doi
         |    GROUP BY 1) i USING (doi))
         |SELECT doi, CAST(mass AS BIGINT) AS mass FROM r2""".stripMargin) {
      (s, d) =>
      Citations.pageRankExact(edgesFromDump(s, d), iterations = 2)
    },

    // HLL approximate distinct counts — the 930M-snapshot answer to
    // "how many DOIs" without a full distinct shuffle. Sketch values
    // are engine-specific (Spark HLL++ vs DuckDB), so rows-only here;
    // GraphSpec bounds the relative error against the exact g2/g3
    // twins at 5%.
    Q.rowsOnly("g9_distinct_approx") { (s, d) =>
      val e = edgesFromDump(s, d)
      e.agg(
        approx_count_distinct(col("citing"), 0.02).as("n_citing"),
        approx_count_distinct(col("cited"), 0.02).as("n_cited"))
    },

    // Publisher-prefix self-citation share: one aggregation, two
    // counters, exact double division on both engines.
    Q("g7_self_citation",
      s"""WITH $EdgeSql
         |SELECT split_part(citing, '/', 1) AS prefix,
         |  count(*) AS n_edges,
         |  CAST(sum(CASE WHEN split_part(citing, '/', 1) =
         |                     split_part(cited, '/', 1)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_self,
         |  CAST(sum(CASE WHEN split_part(citing, '/', 1) =
         |                     split_part(cited, '/', 1)
         |      THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS self_share
         |FROM edges GROUP BY 1""".stripMargin) { (s, d) =>
      Citations.selfCitationByPrefix(edgesFromDump(s, d))
    })
}
