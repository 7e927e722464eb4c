package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A5 — group-cover deduplication (`groupcover -lower -prefs ...`).
  *
  * Semantics (ref: workflows/ai.py:283-307; slides fixture
  * docs/ai-overview/slides.md:396-407): rows are grouped by a dedup key
  * (lowercased DOI). Within each group the row whose source ranks highest
  * in a preference list wins; every *other* row keeps only the labels the
  * winner does NOT have (`labels := labels -- winner.labels`). Rows are
  * never dropped — only label sets shrink. Rows with a null/empty key are
  * untouched.
  *
  * Spark shape: one hash shuffle on the key + two window functions —
  * no global sort (the reference's `sort -t, -k3` is a Unix-toolchain
  * artifact, SURVEY §4) and no driver-side grouping, so the op scales to
  * the 150 M-row dedup the reference runs.
  */
object GroupCover {

  /** @param prefs source ids ordered best-first; unknown sources rank
    *              after all known ones, ties broken by the id column so
    *              the winner is deterministic. */
  def apply(df: DataFrame, id: String, source: String, key: String,
            labels: String, prefs: Seq[String]): DataFrame = {
    // Preference rank as a when-chain: stays in codegen and — unlike an
    // array_position over a literal array — folds to a comparable int.
    val rank = prefs.zipWithIndex.foldLeft(when(lit(false), 0)) {
      case (acc, (s, i)) => acc.when(col(source) === s, i)
    }.otherwise(prefs.size)

    val keyed = col(key).isNotNull && col(key) =!= ""
    val w = Window.partitionBy(col(key))
      .orderBy(col("__rank").asc, col(id).asc)

    // Labels are normalized to sets up front (first-occurrence order):
    // array_except deduplicates its left side as a side effect, so
    // without this a loser carrying duplicate labels would shrink even
    // with zero winner overlap — a silent deviation from
    // `labels := labels -- winner.labels` (ADVICE r02).
    df.withColumn(labels, array_distinct(col(labels)))
      .withColumn("__rank", rank)
      .withColumn("__winner_labels", when(keyed, first(col(labels)).over(w)))
      .withColumn("__rn", when(keyed, row_number().over(w)).otherwise(1))
      .withColumn(labels,
        when(col("__rn") === 1, col(labels))
          // A null winner label set removes nothing — without the
          // guard, array_except(_, null) would null out every loser's
          // labels in the group.
          .otherwise(when(col("__winner_labels").isNotNull,
              array_except(col(labels), col("__winner_labels")))
            .otherwise(col(labels))))
      .drop("__rank", "__winner_labels", "__rn")
  }

  /** The change-file view the reference's `span-update-labels` consumes:
    * only rows whose label set actually shrank, as (id, labels).
    * Ref: workflows/ai.py:310-342. */
  def changes(df: DataFrame, id: String, source: String, key: String,
              labels: String, prefs: Seq[String]): DataFrame = {
    // Compare against the normalized input, by content rather than
    // size, so only rows whose label *set* actually changed are emitted.
    val before = df.select(col(id), array_distinct(col(labels)).as("__before"))
    apply(df, id, source, key, labels, prefs)
      .join(before, Seq(id))
      .filter(sort_array(col(labels)) =!= sort_array(col("__before")))
      .select(col(id), col(labels))
  }
}
