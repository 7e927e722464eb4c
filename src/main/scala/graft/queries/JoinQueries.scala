package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Ops

/** Joins J1–J9 from SURVEY.md §2.3 over the synthetic tables.
  * Small sides are explicit `broadcast()` (the reference holds them as
  * in-memory dicts — sources/jstor.py:670-706); the fact side never
  * shuffles for these lookups. */
object JoinQueries {

  def all: Seq[Q] = Seq(

    // J1 — broadcast dimension lookup chain
    // (ref: sources/jstor.py:618-788, ISSN→collection rewrite).
    Q("j1_broadcast_lookup",
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS cust_cnt,
        |       round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("cust_cnt"), round(sum("c_acctbal"), 2).as("sum_bal"))
    },

    // J2 — prefix→name broadcast map with derived key
    // (ref: sources/crossref.py:578-653, DOI-prefix→publisher).
    Q("j2_prefix_map",
      """WITH map AS (
        |  SELECT split_part(p_type, ' ', 1) AS prefix, CAST(count(*) AS BIGINT) AS n
        |  FROM part GROUP BY 1)
        |SELECT p_partkey, prefix || '-' || CAST(n AS VARCHAR) AS publisher
        |FROM (SELECT p_partkey, split_part(p_type, ' ', 1) AS prefix FROM part) p
        |JOIN map USING (prefix)""".stripMargin) { (s, d) =>
      val part = Tables.part(s, d)
      val prefix = substring_index(col("p_type"), " ", 1)
      val map = part.select(prefix.as("prefix")).groupBy("prefix")
        .agg(count(lit(1)).as("n"))
      part.select(col("p_partkey"), prefix.as("prefix"))
        .join(broadcast(map), Seq("prefix"))
        .select(col("p_partkey"),
                concat(col("prefix"), lit("-"), col("n").cast("string")).as("publisher"))
    },

    // J3 — range join: events inside per-user validity windows — the
    // KBART coverage-interval shape (ref: workflows/ai.py:228-244).
    // Windows are distinct signup days; the join has an equi key
    // (user_id) so Spark plans a hash join with a range residual, not a
    // nested loop.
    Q("j3_range_join",
      """WITH w AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS wstart
        |  FROM events WHERE event_type = 'signup')
        |SELECT w.user_id, strftime(w.wstart, '%Y-%m-%d') AS window_start,
        |       CAST(count(*) AS BIGINT) AS cnt, round(sum(e.value), 2) AS sum_value
        |FROM w JOIN events e
        |  ON e.user_id = w.user_id
        | AND e.ts >= w.wstart AND e.ts < w.wstart + INTERVAL 7 DAY
        |GROUP BY w.user_id, w.wstart""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val w = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), date_trunc("day", col("ts")).as("wstart"))
        .distinct()
      val e = ev.select(col("user_id"), col("ts"), col("value"))
      w.join(e, Seq("user_id"))
        .filter(col("ts") >= col("wstart") &&
                col("ts") < col("wstart") + expr("INTERVAL 7 DAY"))
        .groupBy(col("user_id"), col("wstart"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .select(col("user_id"), date_format(col("wstart"), "yyyy-MM-dd").as("window_start"),
                col("cnt"), col("sum_value"))
    },

    // J4 — OA-flag: whitelist ∪ rule, minus blacklist
    // (ref: workflows/ai.py:758-798).
    Q("j4_oa_flag",
      """SELECT o_orderkey,
        |  (o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |   OR o_orderpriority = '1-URGENT')
        |  AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0)
        |  AS flag
        |FROM orders""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      val wl = cust.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("o_custkey")).withColumn("__w", lit(true))
      val bl = cust.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey").as("o_custkey")).withColumn("__b", lit(true))
      Tables.orders(s, d)
        .join(broadcast(wl), Seq("o_custkey"), "left")
        .join(broadcast(bl), Seq("o_custkey"), "left")
        .select(col("o_orderkey"),
          ((coalesce(col("__w"), lit(false)) || col("o_orderpriority") === "1-URGENT")
            && !coalesce(col("__b"), lit(false))).as("flag"))
    },

    // J6 — existence-probe coverage matrix (ref: workflows/ai.py:571-645).
    Q("j6_coverage",
      """SELECT n_name,
        |  CASE WHEN c IS NULL AND s IS NULL THEN 'NOT_FOUND'
        |       ELSE concat_ws('|', c, s) END AS coverage
        |FROM nation
        |LEFT JOIN (SELECT DISTINCT c_nationkey, 'C' AS c FROM customer) cu
        |  ON n_nationkey = c_nationkey
        |LEFT JOIN (SELECT DISTINCT s_nationkey, 'S' AS s FROM supplier) su
        |  ON n_nationkey = s_nationkey""".stripMargin) { (s, d) =>
      Ops.coverage(
        Tables.nation(s, d).select("n_nationkey", "n_name"), "n_nationkey",
        Seq(("C", Tables.customer(s, d), "c_nationkey"),
            ("S", Tables.supplier(s, d), "s_nationkey")))
        .select("n_name", "coverage")
    },

    // J7 — label-update join (ref: workflows/ai.py:310-342).
    Q("j7_label_update",
      """SELECT o_orderkey,
        |  coalesce(CASE WHEN c_acctbal < 0 THEN 'RISK' END, o_orderpriority) AS priority
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin) { (s, d) =>
      val changes = Tables.customer(s, d)
        .filter(col("c_acctbal") < 0)
        .select(col("c_custkey"), lit("RISK").as("new_label"))
      Ops.updateColumn(Tables.orders(s, d), "o_custkey",
          changes, "c_custkey", "new_label", "o_orderpriority")
        .select(col("o_orderkey"), col("o_orderpriority").as("priority"))
    },

    // J8 — backlog union-join with missing columns
    // (ref: sources/jstor.py:796-825).
    Q("j8_union_backlog",
      """WITH u AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |  FROM orders WHERE year(o_orderdate) >= 1997
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE year(o_orderdate) < 1994)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(count(*) FILTER (o_orderpriority IS NULL) AS BIGINT) AS null_priority,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM u GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val current = o.filter(year(col("o_orderdate")) >= 1997)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      val backlog = o.filter(year(col("o_orderdate")) < 1994)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      Ops.unionSources(Seq(current, backlog))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
             sum(when(col("o_orderpriority").isNull, 1).otherwise(0)).as("null_priority"),
             round(sum("o_totalprice"), 2).as("sum_price"))
    },

    // J9 — file-of-ids containment semi-join (ref: cli.py:461,
    // `filterline`).
    Q("j9_containment",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      val ids = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000).select("o_orderkey")
      Ops.whitelist(Tables.lineitem(s, d), "l_orderkey", ids, "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"))
    })
}
