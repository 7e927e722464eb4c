package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.Scalars

/** Remaining scalar/source operators: F2 HTML unescape, F9 mapping
  * tables, F10 XML parsing (Spark 4 native from_xml — the engine half
  * of the OAI/XML sources S2/F10), F14 checksum validation. */
object MiscQueries {

  val SegmentCode: Map[String, String] = Map(
    "BUILDING" -> "B", "AUTOMOBILE" -> "A", "MACHINERY" -> "M",
    "HOUSEHOLD" -> "H", "FURNITURE" -> "F")

  private val recSchema = StructType(Seq(
    StructField("id", LongType), StructField("lang", StringType)))

  def all: Seq[Q] = Seq(

    // F2 — HTML entity unescape (ref: conversions.py:67-78). The input
    // is synthesized from documents so both engines see identical text.
    Q("f2_html_unescape",
      """SELECT doc_id,
        |  replace(replace(replace(replace(replace(
        |    '&lt;p&gt;' || substring(text, 1, 20) || '&amp;amp; &quot;q&quot;',
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |    '&apos;', ''''), '&amp;', '&') AS unescaped
        |FROM documents""".stripMargin) { (s, d) =>
      val escaped = concat(lit("&lt;p&gt;"), substring(col("text"), 1, 20),
                           lit("&amp;amp; &quot;q&quot;"))
      Tables.documents(s, d)
        .select(col("doc_id"), Scalars.htmlUnescape(escaped).as("unescaped"))
    },

    // F9 — mapping-table lookup with default
    // (ref: conversions.py:579-1017).
    Q("f9_map_lookup",
      s"""SELECT c_custkey,
         |  CASE c_mktsegment ${SegmentCode.toSeq.sortBy(_._1)
               .map { case (k, v) => s"WHEN '$k' THEN '$v'" }.mkString(" ")}
         |  ELSE 'X' END AS seg_code
         |FROM customer""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        Scalars.mapLookup(col("c_mktsegment"), SegmentCode, lit("X")).as("seg_code"))
    },

    // F10/S2 — XML → nested record parsing with Spark's native from_xml
    // (ref: conversions.py:142,524-530; utils.py:448-507 xmlstream).
    // DuckDB has no XML reader, so the oracle extracts the same fields
    // by regex from the identical synthesized document.
    Q("f10_xml_parse",
      """SELECT doc_id,
        |       CAST(regexp_extract(xml, '<id>([0-9]+)</id>', 1) AS BIGINT) AS xml_id,
        |       regexp_extract(xml, '<lang>([a-z]+)</lang>', 1) AS xml_lang
        |FROM (SELECT doc_id,
        |        '<rec><id>' || doc_id || '</id><lang>' || lang || '</lang></rec>' AS xml
        |      FROM documents)""".stripMargin) { (s, d) =>
      val xml = concat(lit("<rec><id>"), col("doc_id"), lit("</id><lang>"),
                       col("lang"), lit("</lang></rec>"))
      Tables.documents(s, d)
        .select(col("doc_id"), from_xml(xml, recSchema).as("rec"))
        .select(col("doc_id"), col("rec.id").as("xml_id"),
                col("rec.lang").as("xml_lang"))
    },

    // F14 — checksum + validity flag (ref: workflows/ai.py:150-157,
    // utils.py:424-445 — zstd magic / content validation, expressed as
    // an in-plan assertion column).
    Q("f14_checksum",
      """SELECT o_orderkey,
        |       md5(concat_ws('|', o_orderkey, o_orderstatus)) AS checksum,
        |       o_totalprice > 0 AS valid
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        md5(concat_ws("|", col("o_orderkey"), col("o_orderstatus"))).as("checksum"),
        (col("o_totalprice") > 0).as("valid"))
    })
}
