package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the 100 TB failure mode the synthetic
  * SF never shows.
  *
  * In the reference's corpus the skew is real and documented: ~80% of
  * all records are Crossref (docs/ai-etc/README.md:50-53), a handful of
  * mega-journals dominate the ISSN distribution, and "null-ish" keys
  * (empty DOI, placeholder ISSN) concentrate entire partitions. Spark's
  * AQE already splits skewed partitions for sort-merge joins
  * (`spark.sql.adaptive.skewJoin`), so plain equi-joins need no help
  * here. What AQE does NOT rebalance:
  *
  *  - shuffled HASH joins against a mid-size dimension (too big to
  *    broadcast, too hot on a few keys) → [[saltedJoin]] replicates the
  *    dimension `factor`× and spreads the fact side deterministically;
  *  - holistic aggregations (`collect_set`/`collect_list`) where one
  *    group holds millions of values → [[saltedCollectSet]] builds the
  *    set in two phases, `(key, salt)` partials then a `factor`-wide
  *    final merge, so no single task ever materializes a hot group
  *    alone.
  *
  * Salts are deterministic (hash of a caller-chosen column, never
  * `rand()`) — reruns and retried tasks produce identical partitioning,
  * which speculative execution and the driver's hash-compare both
  * need. */
object Skew {

  private def saltOf(c: Column, factor: Int): Column =
    pmod(xxhash64(c), lit(factor)).cast("int")

  /** Equi-join `fact ⨝ dim` on `key`, spreading each dimension row to
    * `factor` salted copies so a hot key's fact rows land on `factor`
    * tasks instead of one. `saltBy` must be a fact-side column that
    * varies within a key (a row id, a DOI, a line number) — it seeds
    * the deterministic spread. Inner and left joins only (the
    * replication would multiply unmatched right rows otherwise). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBy: Column, factor: Int,
                 joinType: String = "inner"): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    require(Set("inner", "left", "left_outer")(joinType),
      s"saltedJoin supports inner/left joins, not $joinType")
    val saltedFact = fact.withColumn("__salt", saltOf(saltBy, factor))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    saltedFact
      .join(saltedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** `groupBy(key).agg(collect_set(value))` in two phases: partial sets
    * per `(key, salt)`, then a final merge of at most `factor` partial
    * arrays per key. The partial stage bounds any single task's state
    * to ~1/factor of the hottest group; the final stage merges arrays,
    * not rows. Output: (key..., values: array) with sorted, distinct
    * values (deterministic — collect_set order is not). */
  def saltedCollectSet(df: DataFrame, keys: Seq[String], value: Column,
                       factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val keyCols = keys.map(col)
    df
      .withColumn("__v", value)
      .withColumn("__salt", saltOf(col("__v").cast("string"), factor))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(collect_set(col("__v")).as("__part"))
      .groupBy(keyCols: _*)
      .agg(sort_array(array_distinct(flatten(collect_list(col("__part")))))
        .as("values"))
  }
}
