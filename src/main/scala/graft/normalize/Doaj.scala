package graft.normalize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Scalars

/** DOAJ (source id 28) article JSON → intermediate schema, plus the
  * reference's two cleanup stages re-expressed relationally
  * (sources/doaj.py:80-218):
  *
  *  1. ISSN exclusion — `grep -vf 028_doaj_filter_issn.tsv` becomes a
  *     broadcast anti-join on the record's ISSNs;
  *  2. title dedup — the `sort -k3,3 -k2,2 | tac | sort -u -k3,3`
  *     whitelist (newest record per title) becomes a window
  *     latest-per-key, tie-broken by record id so the winner is
  *     deterministic under any partitioning (the reference's `sort`
  *     tie-break is incidental file order).
  */
object Doaj {

  val SourceId = "28"

  /** Article-dump fields the mapping reads (public DOAJ shape). */
  val InputSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("created_date", StringType),
    StructField("bibjson", StructType(Seq(
      StructField("title", StringType),
      StructField("year", StringType),
      StructField("month", StringType),
      StructField("abstract", StringType),
      StructField("start_page", StringType),
      StructField("end_page", StringType),
      StructField("journal", StructType(Seq(
        StructField("title", StringType),
        StructField("publisher", StringType),
        StructField("language", ArrayType(StringType)),
        StructField("issns", ArrayType(StringType))))),
      StructField("identifier", ArrayType(StructType(Seq(
        StructField("type", StringType),
        StructField("id", StringType))))),
      StructField("author", ArrayType(StructType(Seq(
        StructField("name", StringType))))),
      StructField("keywords", ArrayType(StringType)),
      StructField("link", ArrayType(StructType(Seq(
        StructField("type", StringType),
        StructField("url", StringType))))))))))

  def parse(raw: DataFrame, jsonCol: String): DataFrame =
    raw.withColumn("doc", from_json(col(jsonCol), InputSchema))

  /** One projection, no shuffle. `issns` stays an array here (the
    * exclusion filter needs it); callers flatten for export. */
  def toIntermediate(parsed: DataFrame): DataFrame = {
    val b = col("doc")("bibjson")
    val doi = try_element_at(transform(
      filter(b("identifier"), i => i("type") === "doi"), i => i("id")), lit(1))
    // try_cast: real DOAJ dumps carry dirt like year "2015?" — a plain
    // cast under ANSI mode would abort the whole job on one bad record.
    val year = b("year").try_cast("int")
    val month = coalesce(b("month").try_cast("int"), lit(1))
    parsed
      .filter(col("doc")("id").isNotNull &&
        length(trim(coalesce(b("title"), lit("")))) > 0)
      .select(
        Scalars.synthesizeId(lit(SourceId), col("doc")("id")).as("record_id"),
        lit(SourceId).as("source_id"),
        lit("ElectronicArticle").as("format"),
        Scalars.normalizeDoi(doi).as("doi"),
        b("title").as("title"),
        b("journal")("title").as("jtitle"),
        sort_array(b("journal")("issns")).as("issns"),
        b("journal")("publisher").as("publisher"),
        // Null year must yield a NULL date — format_string would print
        // the literal text "null-01-01", which sorts AFTER every real
        // date and would make undated records win the newest-per-title
        // dedup. A true null sorts last under desc (nulls-last).
        when(year.isNull, lit(null).cast("string"))
          .otherwise(format_string("%04d-%02d-01", year, month)).as("date"),
        Scalars.mapLookup(
          lower(try_element_at(b("journal")("language"), lit(1))),
          Crossref.Lang3, lit("eng")).as("lang"),
        b("start_page").as("spage"),
        b("end_page").as("epage"),
        array_join(transform(b("author"), a => a("name")), "; ").as("authors"),
        array_join(b("keywords"), ",").as("keywords"))
  }

  /** Drop records carrying ANY excluded ISSN (the 028 filter list).
    * The list is a config asset (tens of entries), so it ships as a
    * literal array inside one codegen'd `arrays_overlap` filter — no
    * join in the plan at all, and the predicate sits directly on the
    * scan. Records without an ISSN array pass (grep -vf semantics:
    * nothing to match on). */
  def excludeByIssn(is: DataFrame, excluded: Seq[String]): DataFrame =
    is.filter(!coalesce(
      arrays_overlap(col("issns"), typedLit(excluded)), lit(false)))

  /** Newest record per title (DOAJWhitelist ∘ filter): the shared
    * latest-per-key operator on (date, record_id) — hash-partition by
    * title, in-partition sort only, no global sort; null dates sort
    * last (desc default), so dated records always beat undated ones. */
  def dedupByTitle(is: DataFrame): DataFrame =
    graft.operators.Ops.latestPerKey(
      Seq(col("title")), Seq(col("date"), col("record_id")))(is)
}
