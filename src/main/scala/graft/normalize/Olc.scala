package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Scalars

/** OLC (Online Contents, source id 68) Solr doc → intermediate schema,
  * re-expressing conversions.py:213-335 as one select pipeline.
  *
  * Mapping tables are parameters with small defaults: the reference
  * itself notes "every mapping should live outside of code" — a
  * deployment passes the full curated tables in.
  */
object Olc {

  val SourceId = "68"

  /** internal collection tag → human name (subset of the curated table;
    * ref: conversions.py:219-283). Tags not in the map are dropped. */
  val DefaultCollectionNames: Map[String, String] = Map(
    "SSG-OLC-PHI" -> "Philosophie",
    "SSG-OLC-MAT" -> "Mathematik und Informatik",
    "SSG-OLC-GER" -> "Germanistik",
    "SSG-OLC-HIS" -> "Geschichte",
    "SSG-OLC-TEC" -> "Technik",
    "SSG-OPC-AST" -> "Astronomie")

  /** OLC format → finc.format (ref: conversions.py:284-291). */
  val FormatMap: Map[String, String] = Map(
    "Journal" -> "Journal", "eJournal" -> "Journal",
    "Article" -> "Article", "electronic Article" -> "Article",
    "Monograph Series" -> "Serial", "Serial Volume" -> "Book")

  /** Expected input schema (Solr export fields used by the mapping). */
  val InputSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("abstract", ArrayType(StringType)),
    StructField("author2", ArrayType(StringType)),
    StructField("format", ArrayType(StringType)),
    StructField("collection_details", ArrayType(StringType)),
    StructField("lang_code", ArrayType(StringType)),
    StructField("title", ArrayType(StringType)),
    StructField("title_sub", ArrayType(StringType)),
    StructField("issn", ArrayType(StringType)),
    StructField("container_issue", StringType),
    StructField("container_title", StringType),
    StructField("container_volume", StringType),
    StructField("publisher", ArrayType(StringType)),
    StructField("url", ArrayType(StringType)),
    StructField("publishDateSort", StringType)))

  private def first(c: Column): Column = try_element_at(c, lit(1))

  /** The normalizer: one row in, one intermediate-schema row out. */
  def normalize(docs: DataFrame,
                collectionNames: Map[String, String] = DefaultCollectionNames): DataFrame = {
    // collection_details → "OLC SSG <name>" for known SSG- tags,
    // distinct, order-insensitive (the reference builds a set).
    val mc = array_sort(array_distinct(filter(
      transform(coalesce(col("collection_details"), array()),
        tag => Scalars.mapLookup(tag, collectionNames.map {
          case (k, v) => k -> s"OLC SSG $v"
        }, lit(null).cast("string"))),
      _.isNotNull)))

    val year = col("publishDateSort")
    val hasYear = year.isNotNull && length(year) === 4

    docs.select(
      first(col("abstract")).as("abstract"),
      transform(coalesce(col("author2"), array()),
        name => struct(name.as("rft.au"),
          lit(null).cast("string").as("rft.aufirst"),
          lit(null).cast("string").as("rft.aulast"),
          lit(null).cast("string").as("rft.aucorp"))).as("authors"),
      Scalars.mapLookup(coalesce(first(col("format")), lit("Article")),
        FormatMap, lit(null).cast("string")).as("finc.format"),
      Scalars.synthesizeId(lit(SourceId), col("id")).as("finc.id"),
      col("id").as("finc.record_id"),
      mc.as("finc.mega_collection"),
      lit(SourceId).as("finc.source_id"),
      coalesce(col("lang_code"), array()).as("languages"),
      coalesce(first(col("title")), lit("")).as("rft.atitle"),
      lit("article").as("rft.genre"),
      coalesce(col("issn"), array()).as("rft.issn"),
      coalesce(col("container_issue"), lit("")).as("rft.issue"),
      coalesce(col("container_title"), lit("")).as("rft.jtitle"),
      coalesce(col("publisher"), array()).as("rft.pub"),
      // The reference emits rft.place: [] on every record
      // (conversions.py:330 defaults to an empty list) — match it
      // rather than leaving a null from Schema.conform.
      array().cast("array<string>").as("rft.place"),
      coalesce(col("container_volume"), lit("")).as("rft.volume"),
      coalesce(col("url"), array()).as("url"),
      first(col("title_sub")).as("x.subtitle"),
      when(hasYear, Scalars.yearToRfc3339(year)).as("x.date"),
      when(hasYear, year).as("rft.date"))
      .transform(graft.core.Schema.conform)
  }
}
