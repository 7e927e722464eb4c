package graft.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S11 — Solr export mapping (`span-export -o solr5vu3
  * -with-fullrecord`, ref: sources/crossref.py:750-782,
  * sources/jstor.py:828-860): project intermediate-schema records onto
  * the flat index document, embedding the complete source record as a
  * JSON `fullrecord` column. Pure projection — no shuffle; at 100 TB
  * this stays a map-only stage over the tagged snapshot.
  *
  * Field set follows the public finc/VuFind solr5vu3 schema: identity
  * (id/source_id/record_id), faceting (institution, mega_collection,
  * author_facet, topic, format, genre_facet, access_facet, facet_avail),
  * bibliographic display (title, container_*, publisher, place,
  * description), and retrieval keys (issn, doi, url, language,
  * publishDate/publishDateSort). */
object SolrExport {

  def solr5vu3(records: DataFrame): DataFrame = {
    val all = records.columns.map(c => col(s"`$c`"))
    val year = substring(col("`rft.date`"), 1, 4)
    records.select(
      col("`finc.id`").as("id"),
      col("`finc.source_id`").as("source_id"),
      col("`finc.record_id`").as("record_id"),
      col("`finc.mega_collection`").as("mega_collection"),
      col("`finc.format`").as("format"),
      col("`x.labels`").as("institution"),
      col("`rft.atitle`").as("title"),
      col("`rft.jtitle`").as("container_title"),
      col("`rft.volume`").as("container_volume"),
      col("`rft.issue`").as("container_issue"),
      col("`rft.pages`").as("container_pages"),
      // Corporate authors fall back to aucorp; authors with no usable
      // name drop out entirely (concat_ws never returns null, so the
      // empty-string result must be nulled before the coalesce and the
      // facet filtered — blank facet values pollute the index).
      filter(
        transform(coalesce(col("authors"), array()),
          a => coalesce(a.getField("rft.au"), a.getField("rft.aucorp"),
            nullif(concat_ws(", ", a.getField("rft.aulast"),
              a.getField("rft.aufirst")), lit("")))),
        _.isNotNull)
        .as("author_facet"),
      col("`rft.pub`").as("publisher"),
      col("`rft.place`").as("place"),
      col("subjects").as("topic"),
      col("`rft.genre`").as("genre_facet"),
      coalesce(col("`rft.issn`"), array()).as("issn"),
      coalesce(col("`rft.eissn`"), array()).as("eissn"),
      col("doi"),
      col("abstract").as("description"),
      year.as("publishDate"),
      year.as("publishDateSort"),
      col("languages").as("language"),
      col("url"),
      lit("Electronic Resources").as("access_facet"),
      // availability facet: everything here is an online resource; OA
      // records additionally carry Free (span-export convention).
      when(coalesce(col("`x.oa`"), lit(false)),
        array(lit("Online"), lit("Free")))
        .otherwise(array(lit("Online"))).as("facet_avail"),
      to_json(struct(all: _*)).as("fullrecord"))
  }
}
