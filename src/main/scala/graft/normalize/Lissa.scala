package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.llm.TextAnalysis

/** LISSA (source id 179) — Elasticsearch hits → intermediate schema.
  *
  * The reference normalizes this feed wholly in Python
  * (ref: sources/lissa.py:98-180, the one per-source converter that
  * never shells out): for each `hits.hits[]._source` it builds the IS
  * doc, extracts a DOI from the identifier list, unions
  * subjects/synonyms/tags with `|`-splitting, falls back through
  * date_published → date_created (raising when neither exists), and
  * language-detects the abstract when it is longer than 20 chars.
  * Here the whole mapping is one typed `from_json` + one codegen'd
  * projection — no UDFs, no shuffle; the language detection reuses the
  * engine's [[TextAnalysis.langId]] expression so it also stays inside
  * the scan stage.
  *
  * Python-parity notes (bug-compatible where the reference is quirky):
  *  - only the literal prefix `http://dx.doi.org/` is stripped from a
  *    DOI identifier; an `https://doi.org/...` form passes through
  *    whole (lissa.py:124-135 does exactly that);
  *  - multiple DOIs keep the first (the reference warns and does the
  *    same);
  *  - `url` keeps EVERY http(s) identifier — including the DOI links;
  *  - the reference's `doc.get("language")` branch is dead code (the
  *    built doc never has that key), so detection effectively always
  *    runs on long-enough abstracts; we implement the live branch;
  *  - the reference materializes the subject union via `set()` whose
  *    order is incidental; we sort for determinism.
  */
object Lissa {

  val SourceId = "179"
  val Format = "Preprint"
  val RisType = "EJOUR"
  val Genre = "article"
  val MegaCollections = Seq("LISSA", "sid-179-col-lissa")

  /** ISO639-1 (what [[TextAnalysis.langId]] emits) → the bibliographic
    * 3-letter codes the reference stores
    * (`languages.get(alpha2=...).bibliographic`, lissa.py:141-143). */
  val Lang2B: Map[String, String] = Map(
    "en" -> "eng", "de" -> "ger", "fr" -> "fre", "es" -> "spa",
    "zh" -> "chi")

  /** Minimum abstract length before language detection runs
    * (lissa.py:140 `len(doc["abstract"]) > 20`). */
  val MinDetectLen = 20

  /** The `_source` fields the mapping reads. */
  val SourceSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("contributors", ArrayType(StringType)),
    StructField("publishers", ArrayType(StringType)),
    StructField("identifiers", ArrayType(StringType)),
    StructField("subjects", ArrayType(StringType)),
    StructField("subject_synonyms", ArrayType(StringType)),
    StructField("tags", ArrayType(StringType)),
    StructField("date_published", StringType),
    StructField("date_created", StringType)))

  /** The raw Elasticsearch response envelope (`hits.hits[]._source`).
    * One harvest page is one JSON document (LissaFetch lands exactly
    * this shape), so the envelope schema only descends the one path
    * the normalizer reads. */
  val ResponseSchema: StructType = StructType(Seq(
    StructField("hits", StructType(Seq(
      StructField("hits", ArrayType(StructType(Seq(
        StructField("_source", SourceSchema))))))))))

  /** Parse one `_source` JSON object per row into a typed `src` struct. */
  def parse(raw: DataFrame, jsonCol: String): DataFrame =
    raw.withColumn("src", from_json(col(jsonCol), SourceSchema))

  /** Unwrap a full ES response into one typed `src` row per hit —
    * the explode is the engine half of the harvest's paged envelope. */
  def parseResponse(raw: DataFrame, jsonCol: String): DataFrame =
    raw
      .select(explode(from_json(col(jsonCol), ResponseSchema)
        .getField("hits").getField("hits")).as("hit"))
      .select(col("hit")("_source").as("src"))

  private def nonEmpty(c: Column): Column = nullif(c, lit(""))

  /** One validity filter + one projection (strict=false), or the
    * reference's fail-fast semantics (strict=true: a record with
    * neither date_published nor date_created aborts the job, the
    * ValueError analog at lissa.py:160-172). The lenient mode drops
    * such records instead — the converter-rejection convention the
    * other normalizers use. */
  def toIntermediate(parsed: DataFrame, strict: Boolean = false): DataFrame = {
    val s = col("src")
    val dateSrc = coalesce(nonEmpty(s("date_published")),
      nonEmpty(s("date_created")))
    val abstractC = coalesce(s("description"), lit(""))
    // First identifier mentioning doi.org, with only the literal
    // dx prefix stripped (Python parity, see object doc).
    val doi = replace(
      try_element_at(
        filter(s("identifiers"), i => i.contains("doi.org")), lit(1)),
      lit("http://dx.doi.org/"), lit(""))
    val subjectUnion = array_sort(array_distinct(flatten(transform(
      concat(
        coalesce(s("subjects"), typedLit(Seq.empty[String])),
        coalesce(s("subject_synonyms"), typedLit(Seq.empty[String])),
        coalesce(s("tags"), typedLit(Seq.empty[String]))),
      x => split(x, "\\|")))))
    val lang = when(length(abstractC) > MinDetectLen,
      graft.functions.Scalars.mapLookup(
        TextAnalysis.langId(abstractC), Lang2B, lit("und")))
    val date = if (strict)
      when(dateSrc.isNull, raise_error(concat(
        lit("LISSA record without any date field: "), s("id")))
        .cast("string")).otherwise(dateSrc)
    else dateSrc
    val base = if (strict) parsed else parsed.filter(dateSrc.isNotNull)
    base.select(
      concat(lit(s"ai-$SourceId-"), s("id")).as("record_id"),
      lit(SourceId).as("source_id"),
      s("id").as("local_id"),
      lit(Format).as("format"),
      lit(Genre).as("genre"),
      lit(RisType).as("ris_type"),
      lit(MegaCollections.mkString(",")).as("mega_collection"),
      s("title").as("title"),
      doi.as("doi"),
      array_join(filter(s("identifiers"), i => i.startsWith("http")), ",")
        .as("urls"),
      array_join(s("contributors"), "; ").as("authors"),
      array_join(s("publishers"), "; ").as("publishers"),
      abstractC.as("abstract"),
      lang.as("lang"),
      array_join(subjectUnion, ",").as("subjects"),
      concat(substring(date, 1, 19), lit("Z")).as("x_date"),
      substring(date, 1, 10).as("date"))
  }
}
