package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Perinorm (standards databases) — manual institution tagging.
  *
  * The feed arrives as tarred NDJSON that is NOT intermediate schema,
  * so the reference cannot run span-tag and attaches ISILs by hand
  * (ref: sources/perinorm.py:77-121): for each JSON line, if
  * `mega_collection[0]` matches a config entry, set `institution` to
  * that entry's ISIL list; otherwise leave the doc untouched.
  *
  * Spark-first this is a literal-map lookup — the attachment table is
  * a handful of config rows, so it ships as a `typedLit` MapType
  * constant inside one codegen'd projection: no join, no shuffle, the
  * lookup runs inside the scan stage (the tar/NDJSON scan half is the
  * existing s6/s10 machinery).
  *
  * Divergence note: the reference indexes `mega_collection[0]`
  * unguarded and would crash on an empty array; we use
  * `try_element_at`, so such docs simply match nothing and keep a
  * null institution — the dirty-feed-tolerant convention the other
  * normalizers use.
  */
object Perinorm {

  /** The reference's hand-maintained attachment config
    * (perinorm.py:104-109). Kept as data so a real deployment can
    * pass its own. */
  val DefaultAttachments: Seq[(String, Seq[String])] = Seq(
    "Perinorm (DIN-Normen)" -> Seq("DE-Gla1", "DE-Zi4"),
    "Perinorm (DWA-Regelwerk)" -> Seq("DE-Gla1"),
    "Perinorm (ISO Standards)" -> Seq("DE-Gla1"),
    "Perinorm (VDI-Richtlinien)" -> Seq("DE-Gla1", "DE-Zi4"))

  /** The doc fields the tagging reads/writes; extra fields pass
    * through untouched in a real pipeline (parse keeps the raw line
    * alongside, so the sink can re-emit unmodeled fields). */
  val DocSchema: StructType = StructType(Seq(
    StructField("record_id", StringType),
    StructField("title", StringType),
    StructField("mega_collection", ArrayType(StringType))))

  def parse(raw: DataFrame, jsonCol: String): DataFrame =
    raw.withColumn("doc", from_json(col(jsonCol), DocSchema))

  /** `institution` = attachment list keyed by the FIRST collection
    * name (reference semantics); null when unmatched — to_json omits
    * null fields, matching the reference's leave-untouched behavior
    * on the NDJSON sink. */
  def institutionFor(megaCollection: Column,
                     attachments: Seq[(String, Seq[String])]): Column =
    try_element_at(
      typedLit(attachments.toMap),
      try_element_at(megaCollection, lit(1)))

  def attachInstitutions(
      parsed: DataFrame,
      attachments: Seq[(String, Seq[String])] = DefaultAttachments)
      : DataFrame =
    parsed.withColumn("institution",
      institutionFor(col("doc")("mega_collection"), attachments))
}
