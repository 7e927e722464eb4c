package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OADOI / Unpaywall (oadoi.org) — per-DOI open-access evidence.
  *
  * The reference consumes a ~98 M-row JSONL dump (one object per DOI,
  * format documented in the task docstring, ref: sources/oadoi.py:55-91)
  * and derives a `(doi, is_oa)` CSV used as an OA lookup
  * (ref: sources/oadoi.py:100-125 — the jq projection; the task also
  * counts unparseable lines rather than crashing on them, the
  * 2018-07-05 Unpaywall dump shipped a corrupt row). Here:
  *
  *  - [[parse]] is a typed `from_json`; corrupt lines become a null
  *    struct and are counted, not thrown (`PERMISSIVE` by schema);
  *  - [[doiOaList]] is the reference's CSV: `(doi, is_oa)`, null-DOI
  *    and unparseable rows dropped;
  *  - [[bestOa]] additionally surfaces the best-OA-location evidence
  *    (url/license/version) the reference leaves in the raw dump;
  *  - [[oaFlag]] attaches `x_oa` to a record stream by normalized DOI —
  *    the Unpaywall-keyed sibling of the ISSN-keyed J4 flag join. The
  *    lookup side broadcasts: even the full dump projects to ~100 M
  *    (doi, bool) pairs, but per-corpus slices are dimension-sized; at
  *    full scale the same code plans a hash join on the pre-partitioned
  *    doi key instead (no code change — Spark picks by size).
  */
object Oadoi {

  val LocationSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("host_type", StringType),
    StructField("license", StringType),
    StructField("version", StringType)))

  /** Fields of the Unpaywall dump object the engine reads
    * (ref: sources/oadoi.py:58-88). */
  val Schema: StructType = StructType(Seq(
    StructField("doi", StringType),
    StructField("year", IntegerType),
    StructField("genre", StringType),
    StructField("is_oa", BooleanType),
    StructField("title", StringType),
    StructField("doi_url", StringType),
    StructField("updated", StringType),
    StructField("publisher", StringType),
    StructField("journal_name", StringType),
    StructField("journal_is_oa", BooleanType),
    StructField("journal_issns", StringType),
    StructField("journal_is_in_doaj", BooleanType),
    StructField("published_date", StringType),
    StructField("z_authors", ArrayType(StructType(Seq(
      StructField("given", StringType),
      StructField("family", StringType))))),
    StructField("best_oa_location", LocationSchema),
    StructField("oa_locations", ArrayType(LocationSchema)),
    // Populated (with the raw line) ONLY for unparseable input —
    // from_json's PERMISSIVE mode otherwise nulls every field, which
    // is indistinguishable from an empty-but-valid object.
    StructField("_corrupt_record", StringType)))

  /** JSONL → typed struct column `rec`; corrupt lines keep their raw
    * text in `rec._corrupt_record` (kept — callers count or drop; the
    * reference logs line numbers rather than crashing). */
  def parse(lines: DataFrame, lineCol: String): DataFrame =
    lines.withColumn("rec", from_json(col(lineCol), Schema,
      Map("columnNameOfCorruptRecord" -> "_corrupt_record")))

  /** Unparseable input lines, with their raw text — the reference's
    * error-line report (ref: sources/oadoi.py:108-121). */
  def corruptLines(parsed: DataFrame): DataFrame =
    parsed.filter(col("rec")("_corrupt_record").isNotNull)
      .select(col("rec")("_corrupt_record").as("line"))

  private def normDoi(c: Column): Column = lower(trim(c))

  /** The reference's `(doi, is_oa)` projection
    * (ref: sources/oadoi.py:115-117), minus unparseable/DOI-less rows.
    * DOI normalized to the engine-wide lowercase form. */
  def doiOaList(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("rec")("_corrupt_record").isNull &&
        col("rec")("doi").isNotNull)
      .select(
        normDoi(col("rec")("doi")).as("doi"),
        coalesce(col("rec")("is_oa"), lit(false)).as("is_oa"))

  /** OA evidence per DOI: flag + best-location url/license/version. */
  def bestOa(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("rec")("_corrupt_record").isNull &&
        col("rec")("doi").isNotNull)
      .select(
        normDoi(col("rec")("doi")).as("doi"),
        coalesce(col("rec")("is_oa"), lit(false)).as("is_oa"),
        col("rec")("best_oa_location")("url").as("oa_url"),
        col("rec")("best_oa_location")("license").as("oa_license"),
        col("rec")("best_oa_location")("version").as("oa_version"))

  /** Attach `x_oa` (+ evidence columns when `evidence` holds them) to
    * records by normalized DOI — both sides are normalized here, so
    * evidence from any provenance (re-read CSVs with original-case
    * DOIs included) matches. Unmatched and DOI-less records get
    * `x_oa = false`, mirroring the flag-join default (J4 family).
    *
    * Contract: evidence DOIs should be unique after normalization — a
    * duplicate (dump ∪ changefile unions are the usual cause) fans the
    * matching record out into one row per duplicate, as any left join
    * would; resolve with a latest-per-DOI compaction first. No
    * broadcast hint: dimension-sized evidence broadcasts by size,
    * a full ~100 M-row dump correctly falls back to a shuffled hash
    * join on the pre-partitioned DOI key. */
  def oaFlag(records: DataFrame, recDoi: String,
             evidence: DataFrame): DataFrame = {
    // EVERY evidence column is prefixed before the join — not just the
    // doi key: a record-side column named `is_oa` (or `oa_url`, …)
    // would otherwise collide silently, and the trailing drop("is_oa")
    // could remove the RECORD's column. Surviving evidence columns
    // rename back to their bare names on output, with a loud guard
    // instead of an ambiguous-duplicate schema if the record side
    // already carries one of those names.
    val prefixed = evidence.columns.foldLeft(evidence)((df, c) =>
      df.withColumnRenamed(c, s"__oadoi_$c"))
    val evidenceOut = evidence.columns.filterNot(Set("doi", "is_oa"))
    evidenceOut.filter(records.columns.contains(_)) match {
      case clash if clash.nonEmpty => throw new IllegalArgumentException(
        s"oaFlag: record columns ${clash.mkString(", ")} collide with " +
          "evidence output columns — rename one side first")
      case _ =>
    }
    val joined = records
      .join(prefixed, normDoi(col(recDoi)) === normDoi(col("__oadoi_doi")),
        "left")
      .withColumn("x_oa", coalesce(col("__oadoi_is_oa"), lit(false)))
      .drop("__oadoi_doi", "__oadoi_is_oa")
    evidenceOut.foldLeft(joined)((df, c) =>
      df.withColumnRenamed(s"__oadoi_$c", c))
  }
}
