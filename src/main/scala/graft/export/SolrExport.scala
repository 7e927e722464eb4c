package graft.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S11 — Solr export mapping (`span-export -o solr5vu3
  * -with-fullrecord`, ref: sources/crossref.py:750-782,
  * sources/jstor.py:828-860): project intermediate-schema records onto
  * the flat index document, embedding the complete source record as a
  * JSON `fullrecord` column. Pure projection — no shuffle; at 100 TB
  * this stays a map-only stage over the tagged snapshot. */
object SolrExport {

  def solr5vu3(records: DataFrame): DataFrame = {
    val all = records.columns.map(c => col(s"`$c`"))
    records.select(
      col("`finc.id`").as("id"),
      col("`finc.source_id`").as("source_id"),
      col("`finc.record_id`").as("record_id"),
      col("`finc.mega_collection`").as("mega_collection"),
      col("`x.labels`").as("institution"),
      col("`rft.atitle`").as("title"),
      col("`rft.jtitle`").as("container_title"),
      transform(coalesce(col("authors"), array()),
        a => coalesce(a.getField("rft.au"),
          concat_ws(", ", a.getField("rft.aulast"), a.getField("rft.aufirst"))))
        .as("author_facet"),
      coalesce(col("`rft.issn`"), array()).as("issn"),
      substring(col("`rft.date`"), 1, 4).as("publishDateSort"),
      col("languages").as("language"),
      col("url"),
      to_json(struct(all: _*)).as("fullrecord"))
  }
}
