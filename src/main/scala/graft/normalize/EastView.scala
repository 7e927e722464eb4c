package graft.normalize

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Scalars

/** EastView (source id 210) Solr-add XML → intermediate schema,
  * re-expressing conversions.py:514-573. The raw feed is one XML blob
  * of hundreds of `<doc><field name=...>` elements; the engine splits
  * blobs to per-doc rows (flatMap at the source boundary, like the
  * MARC codec) and maps fields columnar from there.
  */
object EastView {

  val SourceId = "210"
  val DefaultTcid = s"sid-$SourceId-col-udbedu"
  val DefaultCollection =
    "Universal Database of Social Sciences & Humanities (UDB-EDU)"

  /** Split a `<add><doc>...` blob into per-doc field maps. Null or
    * unparseable blobs yield no rows — the budgeted-skip semantics of
    * the reference's conversion loop (conversions.py:117-123 allows a
    * bounded number of per-record failures) rather than failing the
    * whole batch on one corrupt blob; pair with an `observe` error
    * counter (Ops.withQualityMetrics) where the skip rate matters. */
  def parseBlob(xml: String): Seq[Map[String, String]] =
    if (xml == null) Seq.empty
    else scala.util.Try {
      val root = scala.xml.XML.loadString(xml)
      (root \\ "doc").map { doc =>
        (doc \ "field").flatMap { f =>
          val k = f \@ "name"
          val v = f.text
          if (k.nonEmpty && v.nonEmpty) Some(k -> v) else None
        }.toMap
      }
    }.getOrElse(Seq.empty)

  /** Blob column → one row per contained doc, fields as a map column. */
  def explodeBlobs(spark: SparkSession, blobs: DataFrame, xmlCol: String): DataFrame = {
    import spark.implicits._
    blobs.select(col(xmlCol)).as[String]
      .flatMap(parseBlob)
      .toDF("fields")
  }

  /** Field-map rows → intermediate schema. Docs without id, title, or
    * url are dropped (title/url per reference behavior; an id-less doc
    * would otherwise emit a null finc.id into id-keyed dedup/export). */
  def normalize(fieldRows: DataFrame,
                tcid: String = DefaultTcid,
                collectionName: String = DefaultCollection): DataFrame = {
    def f(k: String) = element_at(col("fields"), k)
    val pages = f("pages")
    val year = f("year")
    fieldRows
      .filter(f("id").isNotNull && f("title").isNotNull && f("url").isNotNull)
      .select(
        lit("0.9").as("version"),
        lit("Article").as("finc.format"),
        f("id").as("finc.record_id"),
        Scalars.synthesizeId(lit(SourceId), Scalars.base64Id(f("id"))).as("finc.id"),
        lit(SourceId).as("finc.source_id"),
        f("title").as("rft.atitle"),
        coalesce(f("source"), lit("")).as("rft.jtitle"),
        array(coalesce(f("url"), lit(""))).as("url"),
        transform(
          filter(split(coalesce(f("author"), lit("")), ","), _ =!= ""),
          a => struct(a.as("rft.au"),
            lit(null).cast("string").as("rft.aufirst"),
            lit(null).cast("string").as("rft.aulast"),
            lit(null).cast("string").as("rft.aucorp"))).as("authors"),
        array(lit(collectionName), lit(tcid)).as("finc.mega_collection"),
        when(f("content").isNotNull,
          concat(substring(f("content"), 1, 500), lit("..."))).as("abstract"),
        when(f("language").isNotNull, array(f("language"))).as("languages"),
        when(pages.isNotNull && pages =!= "-", pages).as("rft.pages"),
        f("volume").as("rft.volume"),
        f("number").as("rft.issue"),
        when(f("place").isNotNull, array(f("place"))).as("rft.place"),
        when(year.isNotNull, Scalars.yearToRfc3339(year)).as("x.date"),
        when(year.isNotNull, year).as("rft.date"))
      .transform(graft.core.Schema.conform)
  }
}
