package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSTOR (source id 55) collection refinement — the reference's
  * ISSN→collection rewrite (sources/jstor.py:618-788) as broadcast-join
  * dataflow instead of per-record dict lookups.
  *
  * Per record: union its print+electronic ISSNs, map each to JSTOR
  * collection names (issn→name list), translate names to technical
  * collection ids (jstor→tcid), keep only tcids known to AMSL
  * (tcid→mega), and emit tcids + their mega-collection names. Records
  * with no ISSN mapping fall back on the assumed-OA URL pattern
  * `https?://www.jstor.org/stable/<digits>$` → the Open JSTOR pair;
  * anything else keeps its original collections (the reference logs
  * and leaves the generic name in place).
  *
  * Deviation by design: the reference emits clean_names in Python set
  * iteration order with possible duplicates; we emit sorted-distinct
  * tcids followed by their mega names in matching order — deterministic
  * under any partitioning, which a distributed run needs.
  *
  * All three mapping tables are small dimensions (hundreds of rows in
  * production) — every join below broadcasts; the record side streams
  * once through one explode + one aggregation + one keyed join back.
  */
object Jstor {

  val OpenJstorCollections: Seq[String] =
    Seq("Open JSTOR Collection", "sid-55-col-jstoropen")

  val AssumedOaPattern = "^https?://www\\.jstor\\.org/stable/[0-9]+$"

  /** records: (idCol, issnsCol: array<string>, urlsCol: array<string>,
    *           collectionsCol: array<string> — the incoming generic names)
    * issnNames: (issn, name)   — ISSN → JSTOR collection name (multi)
    * jstorTcid: (name, tcid)   — JSTOR name → technical collection id
    * tcidMega:  (tcid, mega)   — AMSL-known tcid → mega collection
    *
    * Output: (idCol, urlsCol, collectionsCol) with collections
    * rewritten (array<string>).
    *
    * Plan shape: explode_outer the record's ISSNs, left-join the three
    * broadcast dimensions, then ONE hash aggregation back to record
    * grain carrying urls/original collections via first() — the record
    * side streams once, there is exactly one shuffle (the groupBy), and
    * no join-back (which would otherwise sort-merge two record-sized
    * sides at scale). "Had names but none AMSL-valid" (the reference's
    * err.collection.not.in.amsl path → empty collections) is told apart
    * from "no name mapping at all" (→ OA fallback) by flagging the
    * issn→name layer BEFORE tcid translation — `if len(names) > 0`. */
  def refineCollections(records: DataFrame, idCol: String, issnsCol: String,
                        urlsCol: String, collectionsCol: String,
                        issnNames: DataFrame, jstorTcid: DataFrame,
                        tcidMega: DataFrame): DataFrame = {
    val agged = records
      .select(col(idCol), col(urlsCol), col(collectionsCol),
        explode_outer(col(issnsCol)).as("issn"))
      .join(broadcast(issnNames), Seq("issn"), "left")
      .join(broadcast(jstorTcid), Seq("name"), "left")
      .join(broadcast(tcidMega), Seq("tcid"), "left")
      .groupBy(col(idCol))
      .agg(
        first(col(urlsCol)).as(urlsCol),
        first(col(collectionsCol)).as("_orig"),
        // collect_set skips the nulls the when() leaves for invalid rows
        sort_array(collect_set(when(col("mega").isNotNull,
          struct(col("tcid"), col("mega"))))).as("_tm"),
        max(col("name").isNotNull).as("_has_names"))

    val oaFallback = exists(col(urlsCol), u => u.rlike(AssumedOaPattern))
    agged
      .withColumn(collectionsCol,
        when(size(col("_tm")) > 0,
          concat(transform(col("_tm"), x => x("tcid")),
            transform(col("_tm"), x => x("mega"))))
          .when(col("_has_names"), array().cast("array<string>"))
          .when(oaFallback, typedLit(OpenJstorCollections))
          .otherwise(col("_orig")))
      .drop("_tm", "_has_names", "_orig")
  }
}
