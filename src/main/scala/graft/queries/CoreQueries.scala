package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{GroupCover, Ops}

/** Windows (W1–W3), aggregations (A1–A6), sorts (O1–O3), set ops
  * (U1–U3) from SURVEY.md §2, each expressed over the driver's synthetic
  * tables with a DuckDB oracle (FIXTURES.md §B mapping). */
object CoreQueries {

  /** Groupcover preference list over documents.source (A5). */
  val DocPrefs: Seq[String] =
    Seq("src3", "src1", "src4", "src0", "src5", "src9", "src2", "src6")

  def all: Seq[Q] = Seq(

    // W1 — latest event per user (ref: sources/jstor.py:296-313).
    // ts is ns-precision parquet; both engines rank on the
    // second-truncated value with event_id tiebreak so Spark's µs
    // truncation can't flip the winner.
    Q("w1_latest_event_per_user",
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY date_trunc('second', ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin) { (s, d) =>
      Ops.latestPerKey(
        Seq(col("user_id")),
        Seq(date_trunc("second", col("ts")), col("event_id")))(
        Tables.events(s, d))
        .select("user_id", "event_id", "event_type", "value")
    },

    // W2 — latest per (user, type) (ref: sources/doaj.py:176-183).
    Q("w2_latest_event_per_user_type",
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |           ORDER BY date_trunc('second', ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin) { (s, d) =>
      Ops.latestPerKey(
        Seq(col("user_id"), col("event_type")),
        Seq(date_trunc("second", col("ts")), col("event_id")))(
        Tables.events(s, d))
        .select("user_id", "event_type", "event_id", "value")
    },

    // W3 — snapshot compaction: latest order per customer — the
    // Crossref latest-per-DOI shape (ref: sources/crossref.py:181-214).
    Q("w3_snapshot_latest_per_customer",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       strftime(o_orderdate, '%Y-%m-%d') AS o_date FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin) { (s, d) =>
      Ops.latestPerKey(
        Seq(col("o_custkey")),
        Seq(col("o_orderdate"), col("o_orderkey")))(
        Tables.orders(s, d))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
    },

    // W3 as a max_by aggregate (order key = days×2^40 + orderkey so
    // ties cannot exist): partial aggregation reduces groups map-side
    // before the shuffle — the preferred snapshot-compaction plan when
    // groups span partitions (see Ops.latestPerKeyAgg). The day shift
    // leaves 40 bits for the tiebreak id, so keys stay collision-free
    // up to ~10^12 orders (TPC-H sf≈150k) — a 10^8 multiplier would
    // collide at large SF (ADVICE r02).
    Q("w4_snapshot_latest_agg",
      """SELECT o_custkey,
        |       arg_max(o_orderkey, okey) AS o_orderkey,
        |       arg_max(o_totalprice, okey) AS o_totalprice,
        |       arg_max(strftime(o_orderdate, '%Y-%m-%d'), okey) AS o_date
        |FROM (SELECT *,
        |        datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
        |          * 1099511627776 + o_orderkey AS okey
        |      FROM orders)
        |GROUP BY o_custkey""".stripMargin) { (s, d) =>
      val okey = datediff(col("o_orderdate"), lit("1990-01-01")).cast("long") *
        (1L << 40) + col("o_orderkey")
      Ops.latestPerKeyAgg(Seq("o_custkey"), okey)(Tables.orders(s, d))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
    },

    // A1 — group-count + sums (ref: sources/crossref.py:296-330).
    // sum_qty is exact (whole-number doubles); money sums rounded.
    Q("a1_group_agg",
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS cnt,
        |       sum(l_quantity) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       round(avg(l_discount), 4) AS avg_disc
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
             sum("l_quantity").as("sum_qty"),
             round(sum("l_extendedprice"), 2).as("sum_price"),
             round(avg("l_discount"), 4).as("avg_disc"))
    },

    // A2 — global distinct (ref: sources/crossref.py:445-447).
    Q("a2_distinct_global",
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders") { (s, d) =>
      Tables.orders(s, d).select("o_orderstatus", "o_orderpriority").distinct()
    },

    // A3 — set-builder per key (ref: sources/jstor.py:586-612).
    Q("a3_set_builder",
      """SELECT n_name,
        |       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
        |       CAST(count(DISTINCT c_custkey) AS BIGINT) AS cust_cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
              col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(concat_ws(",", sort_array(collect_set(col("c_mktsegment")))).as("segments"),
             countDistinct("c_custkey").as("cust_cnt"))
    },

    // A4 — counter/stats accumulation (ref: sources/jstor.py:696-785).
    Q("a4_stats_by_class",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |       round(sum(value), 2) AS sum_value,
        |       round(avg(value), 2) AS avg_value,
        |       min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
             round(sum("value"), 2).as("sum_value"),
             round(avg("value"), 2).as("avg_value"),
             min("value").as("min_value"),
             max("value").as("max_value"))
    },

    // A5 — groupcover dedup (ref: workflows/ai.py:283-307): group docs
    // by a synthetic dup key; winner by source preference keeps its
    // labels, losers shed the overlap.
    Q("a5_groupcover",
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |         n_chars % 50 AS dup_key,
         |         ['L-' || lang, 'S-' || source] AS labels,
         |         ${prefCaseSql("source", DocPrefs)} AS rank
         |  FROM documents),
         |w AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY dup_key ORDER BY rank, doc_id) AS rn,
         |    first_value(labels) OVER (PARTITION BY dup_key ORDER BY rank, doc_id) AS wl
         |  FROM d)
         |SELECT doc_id,
         |       coalesce(array_to_string(CASE WHEN rn = 1 THEN labels
         |         ELSE list_filter(labels, x -> NOT list_contains(wl, x)) END, ','), '') AS labels
         |FROM w""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .withColumn("dup_key", (col("n_chars") % 50).cast("string"))
        .withColumn("labels",
          array(concat(lit("L-"), col("lang")), concat(lit("S-"), col("source"))))
      GroupCover(docs, "doc_id", "source", "dup_key", "labels", DocPrefs)
        .select(col("doc_id"), array_join(col("labels"), ",").as("labels"))
    },

    // A6/J5 — pairwise overlap stats (ref: workflows/ai.py:432-513).
    Q("a6_pairwise_overlap",
      """SELECT a.t1, b.t2, CAST(count(*) AS BIGINT) AS overlap
        |FROM (SELECT DISTINCT event_type AS t1, user_id AS k FROM events) a
        |JOIN (SELECT DISTINCT event_type AS t2, user_id AS k FROM events) b
        |  ON a.k = b.k AND a.t1 < b.t2
        |GROUP BY a.t1, b.t2""".stripMargin) { (s, d) =>
      Ops.pairwiseOverlap(Tables.events(s, d), "event_type", "user_id")
    },

    // A7 — exact per-group quantiles (corpus length distributions: the
    // report-sink stat a curation run logs). Spark's `percentile` agg
    // buffers a VALUE->count map per group, so it is exact AND
    // scale-safe precisely when the column's cardinality is bounded
    // (integer doc lengths here); unbounded doubles take
    // percentile_approx instead. Quarter-fractions over integer data
    // interpolate exactly in binary doubles, so the values hash-match
    // DuckDB's quantile_cont (same lower+(higher-lower)*frac
    // definition) with no rounding.
    Q("a7_quantiles",
      """SELECT g.lang, CAST(ix.j AS INT) AS q_idx,
        |       g.qs[ix.j + 1] AS n_chars_q
        |FROM (SELECT lang,
        |        quantile_cont(CAST(n_chars AS DOUBLE), [0.25, 0.5, 0.75])
        |          AS qs
        |      FROM documents GROUP BY lang) g
        |CROSS JOIN (SELECT unnest(range(0, 3)) AS j) ix""".stripMargin) {
      (s, d) =>
      Tables.documents(s, d).groupBy("lang")
        .agg(expr("percentile(CAST(n_chars AS DOUBLE), array(0.25D, 0.5D, 0.75D))")
          .as("qs"))
        .select(col("lang"), posexplode(col("qs")).as(Seq("q_idx", "n_chars_q")))
    },

    // A7b — the UNBOUNDED-double quantile regime: a7's exact
    // `percentile` buffers a value→count map per group, which is only
    // scale-safe when the column's cardinality is bounded; prices are
    // effectively unique per row, so the report family's other half is
    // the KLL/GK-style mergeable sketch `approx_percentile` (fixed
    // memory per group regardless of cardinality — the only shape that
    // survives a 100 TB column). Sketch internals are engine-specific,
    // so rows-only; OpsSpec bounds the rank error against the exact
    // quantiles at the sketch's declared 1/accuracy guarantee.
    Q.rowsOnly("a8_quantiles_approx") { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, " +
          "array(0.25D, 0.5D, 0.75D), 10000)").as("qs"))
        .select(col("l_returnflag"),
          posexplode(col("qs")).as(Seq("q_idx", "price_q")))
    },

    // O1 — external top-k sort with unique tiebreak
    // (ref: workflows/ai.py:268-276).
    Q("o1_topk_sort",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    },

    // O2 — limit + offset (ref: sources/jstor.py:492).
    Q("o2_limit_offset",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 50 OFFSET 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .orderBy("o_orderkey")
        .offset(10).limit(50)
        .select("o_orderkey", "o_totalprice")
    },

    // O3 — reverse scan (ref: sources/jstor.py:299, `tac`).
    Q("o3_reverse_scan",
      """SELECT event_id, event_type FROM events
        |ORDER BY event_id DESC LIMIT 100""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .orderBy(col("event_id").desc)
        .limit(100)
        .select("event_id", "event_type")
    },

    // U1 — union of source slices (ref: workflows/ai.py:116-165).
    Q("u1_union_slices",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM (
        |  SELECT * FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT * FROM events WHERE value > 100
        |) GROUP BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      Ops.unionSources(Seq(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("value") > 100)))
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
    },

    // U2 — intersect (ref: workflows/ai.py:454).
    Q("u2_intersect",
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 0""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(col("o_custkey").as("custkey"))
        .intersect(Tables.customer(s, d)
          .filter(col("c_acctbal") > 0).select(col("c_custkey").as("custkey")))
    },

    // U3 — except/difference (ref: workflows/adhoc.py:91-92).
    Q("u3_except",
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("custkey"))
        .except(Tables.orders(s, d).select(col("o_custkey").as("custkey")))
    })

  /** CASE chain ranking a source column by preference-list position —
    * shared by the Spark impl (GroupCover) and the oracle SQL. */
  def prefCaseSql(sourceCol: String, prefs: Seq[String]): String =
    prefs.zipWithIndex
      .map { case (p, i) => s"WHEN '$p' THEN $i" }
      .mkString(s"CASE $sourceCol ", " ", s" ELSE ${prefs.size} END")
}
