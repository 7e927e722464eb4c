package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Scalars

/** Datacite OAI harvest → intermediate schema — the largest remaining
  * production feed (sources/datacite.py:55-120: metha-harvested OAI
  * `oai_dc` records → `Records/Record` XML → morph → IS), re-expressing
  * the metafacture mapping (assets/datacite/flux.flux +
  * assets/datacite/morph.xml) as one columnar projection over the
  * record slices emitted by [[graft.sources.Xml.recordsFromFiles]].
  *
  * Field mapping (morph.xml rule → column):
  *   - `dc:description` → `abstract`
  *   - `dc:creator`* → `authors[].rft.au`
  *   - `dc:language` → `languages[]`, each via the sprachliste lookup
  *     with the raw value as fallback (morph `choose`)
  *   - `dc:identifier` matching `^http` → `url[]`
  *   - `dc:type` via the format lookup, else the flux default
  *     `ElectronicArticle` (morph `choose` over lookup/constant —
  *     the constant always fires, so the third raw-value branch is
  *     unreachable; same here)
  *   - `finc.mega_collection` = ["Datacite"], `finc.source_id` =
  *     "datacite" (flux.flux defaults)
  *   - header `identifier` → `finc.record_id`; `finc.id` =
  *     `finc-datacite-<b64url(identifier)>` (morph combine +
  *     b64URLEncode)
  *   - `dc:title` → `rft.atitle`; `dc:date` → `rft.date` and
  *     `x.date` = date + "T00:00:00Z"
  *   - `dc:source` values matching the ISSN shape → `rft.issn[]`
  *     (unique); the `title; volume (year); n` shape → `rft.jtitle`
  *     (group 1) and `rft.volume` (group 2)
  *   - `dc:publisher`* → `rft.pub[]`
  *   - `dc:subject` split on "," + trim → `x.subjects[]`
  *   - `dc:type` via the genre lookup (no fallback) → `rft.genre`
  *   - `dc:identifier` matching `^doi:` → `doi` (prefix stripped)
  *
  * Deleted OAI records (`<header status="deleted">`) are dropped —
  * flux.flux's "filter deleted records" contract.
  *
  * Mapping tables are parameters with small defaults (the reference
  * keeps the curated TSVs in assets/maps and notes mappings should
  * live outside code); a deployment passes the full tables in.
  *
  * Scale shape: the harvest arrives as many files → parallelism is the
  * file count for the split, then pure per-record projection (regex
  * field extraction, no UDF, no shuffle).
  */
object Datacite {

  val SourceId = "datacite"
  val MegaCollection = "Datacite"
  val DefaultFormat = "ElectronicArticle"

  /** subset of assets/maps/filemap_fincformat.tsv */
  val DefaultFormatMap: Map[String, String] = Map(
    "Image" -> "Image",
    "Monograph" -> "Book",
    "Volume" -> "Book",
    "info:eu-repo/semantics/article" -> "ElectronicArticle")

  /** subset of assets/maps/filemap_rft.genre.tsv */
  val DefaultGenreMap: Map[String, String] = Map(
    "sheet music" -> "unknown",
    "Monograph" -> "Book",
    "Volume" -> "Issue",
    "info:eu-repo/semantics/article" -> "article")

  /** subset of assets/maps/sprachliste.tsv (ISO 639-1 → 639-2/B) */
  val DefaultLangMap: Map[String, String] = Map(
    "en" -> "eng", "de" -> "ger", "es" -> "spa", "fr" -> "fre",
    "it" -> "ita", "zh" -> "chi", "English" -> "eng")

  /** `title; volume (year); n` — morph.xml's dc:source shape. */
  private val JtitleRe = "^(.*);\\s(.*);\\s(.*)$"
  private val VolumeRe = "^(.*;\\s)(.*)\\s\\(\\d\\d\\d\\d\\);\\s(.*)$"
  private val IssnRe = "^[0-9]{4}-[0-9]{3}[0-9X]$"

  private def values(xml: Column, tag: String): Column =
    regexp_extract_all(xml, lit(s"<$tag>([^<]*)</$tag>"), lit(1))

  private def firstValue(xml: Column, tag: String): Column =
    try_element_at(values(xml, tag), lit(1))

  /** URL-safe base64 without padding (the morph's b64URLEncode). */
  def b64Url(c: Column): Column =
    translate(Scalars.base64Id(c), "+/", "-_")

  /** Drop deleted-header records (flux: "filter deleted records"). */
  def liveRecords(records: DataFrame, xmlCol: String = "xml"): DataFrame =
    records.filter(!col(xmlCol).rlike("<header[^>]*status=\"deleted\""))

  /** One OAI `Record` slice in → one intermediate-schema row out. */
  def toIntermediate(records: DataFrame, xmlCol: String = "xml",
                     formatMap: Map[String, String] = DefaultFormatMap,
                     genreMap: Map[String, String] = DefaultGenreMap,
                     langMap: Map[String, String] = DefaultLangMap): DataFrame = {
    val xml = col(xmlCol)
    val identifier = firstValue(xml, "identifier")
    val identifiers = values(xml, "dc:identifier")
    // The morph applies each dc:source regexp to EVERY value — a
    // record may list its ISSN before the journal-shaped string, so
    // jtitle/volume come from the first MATCHING value, not the first.
    // The three identical values(xml, "dc:source") subtrees (here and
    // in rft.issn) collapse to one evaluation under whole-stage
    // codegen's subexpression elimination — no staging needed.
    val jtitleSrc = try_element_at(
      filter(values(xml, "dc:source"), _.rlike(JtitleRe)), lit(1))
    val volumeSrc = try_element_at(
      filter(values(xml, "dc:source"), _.rlike(VolumeRe)), lit(1))
    val date1 = firstValue(xml, "dc:date")
    val doiRaw = try_element_at(
      filter(identifiers, _.startsWith("doi:")), lit(1))
    liveRecords(records, xmlCol).select(
      firstValue(xml, "dc:description").as("abstract"),
      transform(values(xml, "dc:creator"),
        name => struct(name.as("rft.au"))).as("authors"),
      transform(values(xml, "dc:language"),
        l => Scalars.mapLookup(l, langMap, l)).as("languages"),
      filter(identifiers, _.rlike("^http")).as("url"),
      Scalars.mapLookup(coalesce(firstValue(xml, "dc:type"), lit("")),
        formatMap, lit(DefaultFormat)).as("finc.format"),
      array(lit(MegaCollection)).as("finc.mega_collection"),
      identifier.as("finc.record_id"),
      concat(lit(s"finc-$SourceId-"), b64Url(identifier)).as("finc.id"),
      lit(SourceId).as("finc.source_id"),
      firstValue(xml, "dc:title").as("rft.atitle"),
      date1.as("rft.date"),
      when(date1.isNotNull, concat(date1, lit("T00:00:00Z"))).as("x.date"),
      array_distinct(filter(values(xml, "dc:source"), _.rlike(IssnRe)))
        .as("rft.issn"),
      when(jtitleSrc.isNotNull,
        regexp_extract(jtitleSrc, JtitleRe, 1)).as("rft.jtitle"),
      values(xml, "dc:publisher").as("rft.pub"),
      when(volumeSrc.isNotNull,
        regexp_extract(volumeSrc, VolumeRe, 2)).as("rft.volume"),
      flatten(transform(values(xml, "dc:subject"),
        s => transform(split(s, ","), t => trim(t)))).as("x.subjects"),
      Scalars.mapLookup(coalesce(firstValue(xml, "dc:type"), lit("")),
        genreMap, lit(null).cast("string")).as("rft.genre"),
      when(doiRaw.isNotNull, regexp_replace(doiRaw, "^doi:", "")).as("doi"))
  }
}
