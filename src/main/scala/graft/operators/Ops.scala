package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The generic operator kit (SURVEY.md §2) — each op is a
  * `DataFrame => DataFrame` transform built from declarative Spark
  * primitives so Catalyst keeps pushdown / pruning / join planning.
  *
  * Scale notes are inline per op; the common rules:
  *  - latest-per-key is window `row_number`, never a global sort —
  *    the shuffle is hash-by-key and sorting happens within partitions
  *    (UnsafeExternalSorter spills), so it survives the 6 TB Crossref
  *    snapshot shape (ref: sources/crossref.py:136-214).
  *  - small sides are explicitly `broadcast()` — mapping tables in the
  *    reference are in-memory dicts (sources/jstor.py:670-706).
  */
object Ops {

  /** W1–W3 — latest record per key (newest wins).
    *
    * `order` columns are tried in sequence, descending; callers must end
    * with a unique tiebreaker (e.g. the record id) so the winner is
    * deterministic. Ref: sources/jstor.py:296-313 (member list),
    * sources/doaj.py:176-183 (title+date), sources/crossref.py:181-214
    * (the 6 TB latest-per-DOI snapshot).
    */
  def latestPerKey(keys: Seq[Column], order: Seq[Column])(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** W3 alternative — latest-per-key as an aggregate (`max_by` over the
    * full row) with map-side partial aggregation: the shuffle carries
    * one row per (map partition, key) instead of every input row. For
    * high-cardinality snapshot compaction (the 6 TB Crossref shape,
    * 930M→150M rows) this beats the window form whenever groups span
    * map partitions — the window must co-locate and rank ALL rows of a
    * group, max_by reduces them before the shuffle. Physical note:
    * max_by over a struct payload is not hash-aggregatable (struct
    * agg buffer), so Spark plans SortAggregate — a within-partition
    * sort by grouping key only, on the already-reduced data; there is
    * still no global sort and no per-group rank state. `orderCol` must
    * be totally ordered (encode tiebreaks into it) for a deterministic
    * winner. */
  def latestPerKeyAgg(keys: Seq[String], orderCol: Column)(df: DataFrame): DataFrame = {
    val payload = struct(df.columns.map(c => col(s"`$c`")): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, orderCol).as("__row"))
      // max_by ignores null-ordered rows, so a group whose orderCol is
      // entirely null yields a null struct; exploding that would emit a
      // ghost row of all nulls (including the key). Such groups violate
      // the totally-ordered contract — drop them instead of emitting
      // corrupt rows (the window form would keep an arbitrary row).
      .filter(col("__row").isNotNull)
      .select("__row.*")
  }

  /** P5 — whitelist semi-join: keep rows whose key appears in `ids`.
    * Ref: sources/doaj.py:190-217 (`grep -Ff whitelist`). The id list is
    * small (10^4–10^6) → broadcast, no shuffle of the big side. */
  def whitelist(df: DataFrame, key: String, ids: DataFrame, idCol: String): DataFrame =
    df.join(broadcast(ids.select(col(idCol).as(key)).distinct()), Seq(key), "left_semi")

  /** P6 — blacklist anti-join. Ref: sources/doaj.py:128-137 (`grep -vf`). */
  def blacklist(df: DataFrame, key: String, ids: DataFrame, idCol: String): DataFrame =
    df.join(broadcast(ids.select(col(idCol).as(key)).distinct()), Seq(key), "left_anti")

  /** U1 — union heterogeneous per-source frames, null-filling missing
    * columns. Ref: workflows/ai.py:116-165 (the AI merge). */
  def unionSources(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionSources: no input frames")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** P9 — record redaction: drop sensitive fields.
    * Ref: workflows/ai.py:168-190 (`span-redact` deletes x.fulltext). */
  def redact(df: DataFrame, cols: String*): DataFrame = df.drop(cols: _*)

  /** J7 — label update join: replace a column by key from a (small)
    * change set, keeping the old value when no change exists.
    * Ref: workflows/ai.py:310-342 (`span-update-labels`). */
  def updateColumn(df: DataFrame, key: String, changes: DataFrame,
                   changeKey: String, changeVal: String, target: String): DataFrame = {
    val ch = broadcast(
      changes.select(col(changeKey).as(key), col(changeVal).as("__newval")))
    df.join(ch, Seq(key), "left")
      .withColumn(target, coalesce(col("__newval"), col(target)))
      .drop("__newval")
  }

  /** J6 — existence/coverage probe: for each key of `dim`, which of the
    * `facts` contain it; absent everywhere → NOT_FOUND marker.
    * Ref: workflows/ai.py:571-645. Facts are reduced to distinct keys
    * first so the join input is minimal. */
  def coverage(dim: DataFrame, dimKey: String,
               facts: Seq[(String, DataFrame, String)]): DataFrame = {
    val flagged = facts.foldLeft(dim) { case (acc, (name, fact, factKey)) =>
      val keys = fact.select(col(factKey).as(dimKey)).distinct()
        .withColumn(s"__has_$name", lit(name))
      acc.join(keys, Seq(dimKey), "left")
    }
    val flagCols = facts.map { case (name, _, _) => col(s"__has_$name") }
    flagged
      .withColumn("coverage",
        coalesce(concat_ws("|", flagCols: _*), lit("")))
      .withColumn("coverage",
        when(col("coverage") === "", lit("NOT_FOUND")).otherwise(col("coverage")))
      .drop(facts.map { case (name, _, _) => s"__has_$name" }: _*)
  }

  /** A4 — counter/stats side output without a second pass: attach
    * `observe` metrics to the flowing plan (the reference keeps a
    * Python Counter while streaming records — sources/jstor.py:696-785;
    * here the metrics ride the same job, zero extra scans). Read the
    * values from `Observation.get` after the action. */
  def withQualityMetrics(df: DataFrame, obs: org.apache.spark.sql.Observation,
                         errorCond: Column): DataFrame =
    df.observe(obs,
      count(lit(1)).as("n_records"),
      sum(when(errorCond, 1L).otherwise(0L)).as("n_errors"))

  /** Skew-resistant aggregation: two-phase group-by with a salt on the
    * hot key space. Phase 1 aggregates (key, salt) partials — hot keys
    * spread over `salts` reducers — phase 2 merges partials per key.
    * Use for holistic aggregates (collect_list/set-style) over keys
    * with power-law frequency — algebraic aggs already reduce map-side
    * (AQE's skew handling covers joins, not aggregations). The salt is
    * a content hash, so byte-identical duplicate rows share a salt —
    * deterministic under retry at the cost of not spreading literal
    * duplicates (which map-side partials absorb anyway). */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
                aggs: Seq[(String, Column, Column => Column)]): DataFrame = {
    // The salt MUST be a deterministic function of the row: a
    // nondeterministic salt (partition id / monotonic id) re-routes
    // rows to different reducers when a stage retry replays a map task,
    // double-counting or dropping them (the SPARK-23207 class of bug).
    val rowHash = xxhash64(df.columns.map(c => col(s"`$c`")): _*)
    val phase1 = df
      .withColumn("__salt", pmod(rowHash, lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(aggs.head._2.as(aggs.head._1),
           aggs.tail.map { case (a, p, _) => p.as(a) }: _*)
    phase1
      .groupBy(col(key))
      .agg(aggs.head._3(col(aggs.head._1)).as(aggs.head._1),
           aggs.tail.map { case (a, _, m) => m(col(a)).as(a) }: _*)
  }

  /** J5/A6 — pairwise key-overlap statistics between tagged sources:
    * one aggregation over the self-join on the shared key, grouped by the
    * unordered tag pair. Ref: workflows/ai.py:432-513. */
  def pairwiseOverlap(df: DataFrame, tag: String, key: String): DataFrame = {
    val a = df.select(col(tag).as("t1"), col(key).as("k")).distinct()
    val b = df.select(col(tag).as("t2"), col(key).as("k")).distinct()
    a.join(b, Seq("k"))
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2")
      .agg(count("k").as("overlap"))
  }
}
