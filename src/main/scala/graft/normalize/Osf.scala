package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Scalars
import graft.llm.TextAnalysis

/** OSF preprints (source id 179) API JSON → intermediate schema,
  * re-expressing conversions.py:363-511 as a select pipeline plus one
  * broadcast join.
  *
  * Differences from the reference, by design:
  *  - authors come from a pre-fetched contributors table (the reference
  *    fetches+caches HTTP per record inside the converter — network I/O
  *    stays in ingest, outside the engine; SURVEY §7.4.5);
  *  - language detection is the engine's built-in n-gram heuristic
  *    (a codegen'd expression) instead of a per-record lingua call,
  *    with the same "eng" default.
  */
object Osf {

  val SourceId = "179"

  /** provider → technical collection id overrides
    * (ref: conversions.py:375-389); others default to
    * sid-179-col-<provider>. */
  val ProviderTcid: Map[String, String] = Map(
    "eartharxiv" -> "earth", "ecoevorxiv" -> "eco", "lawarxiv" -> "law",
    "lissa" -> "lissa", "mediarxiv" -> "medi", "psyarxiv" -> "psy",
    "socarxiv" -> "soc")

  /** Raw preprint document schema (the API fields the mapping reads). */
  val InputSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("attributes", StructType(Seq(
      StructField("title", StringType),
      StructField("description", StringType),
      StructField("tags", ArrayType(StringType)),
      StructField("preprint_doi_created", StringType)))),
    StructField("relationships", StructType(Seq(
      StructField("provider", StructType(Seq(
        StructField("data", StructType(Seq(
          StructField("id", StringType)))))))))),
    StructField("links", StructType(Seq(
      StructField("preprint_doi", StringType))))))

  /** Contributors sidecar schema: one row per (preprint, author).
    * `position` is the author's order in the API response — collect_list
    * after a shuffle has no defined order, so ordering must ride the
    * data to keep first-author deterministic across runs. */
  val ContributorSchema: StructType = StructType(Seq(
    StructField("preprint_id", StringType),
    StructField("position", IntegerType),
    StructField("given_name", StringType),
    StructField("family_name", StringType)))

  private def tcid(provider: Column): Column =
    concat(lit(s"sid-$SourceId-col-"),
      graft.functions.Scalars.mapLookup(provider, ProviderTcid, provider))

  /** Map the 2-letter heuristic language to the 3-letter codes the
    * intermediate schema uses; unknown → eng (reference default). */
  private def lang3(text: Column): Column =
    graft.functions.Scalars.mapLookup(
      TextAnalysis.langId(text),
      Map("en" -> "eng", "de" -> "deu", "fr" -> "fra", "es" -> "spa"),
      lit("eng"))

  def normalize(preprints: DataFrame, contributors: DataFrame): DataFrame = {
    val provider = col("relationships.provider.data.id")
    val doiUrl = col("links.preprint_doi")
    val created = col("attributes.preprint_doi_created")

    val authors = contributors
      .groupBy(col("preprint_id").as("id"))
      .agg(transform(
        array_sort(collect_list(struct(
          col("position"),
          struct(
            lit(null).cast("string").as("rft.au"),
            col("given_name").as("rft.aufirst"),
            col("family_name").as("rft.aulast"),
            lit(null).cast("string").as("rft.aucorp")).as("a")))),
        s => s.getField("a")).as("authors"))

    preprints
      .join(broadcast(authors), Seq("id"), "left")
      .select(
        coalesce(col("attributes.description"), lit("")).as("abstract"),
        coalesce(col("authors"), array()).as("authors"),
        lit("Preprint").as("finc.format"),
        Scalars.synthesizeId(lit(SourceId), col("id")).as("finc.id"),
        col("id").as("finc.record_id"),
        array(tcid(provider), initcap(provider)).as("finc.mega_collection"),
        lit(SourceId).as("finc.source_id"),
        array(when(col("attributes.description").isNotNull &&
                   col("attributes.description") =!= "",
               lang3(col("attributes.description"))).otherwise(lit("eng")))
          .as("languages"),
        regexp_replace(doiUrl, "^https://doi\\.org/", "").as("doi"),
        col("attributes.title").as("rft.atitle"),
        lit("article").as("rft.genre"),
        provider.as("rft.jtitle"),
        array(lit("OSF Preprints")).as("rft.pub"),
        array(doiUrl).as("url"),
        coalesce(col("attributes.tags"), array()).as("subjects"),
        when(created.isNotNull && created =!= "",
          concat(created, lit("Z"))).as("x.date"),
        when(created.isNotNull && created =!= "",
          substring(created, 1, 10)).as("rft.date"))
      .transform(graft.core.Schema.conform)
  }
}
