package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DBLP — computer-science bibliography XML.
  *
  * The reference's "QnD doi list" (ref: sources/dblp.py:90-111) is a
  * Unix pipeline over the raw XML: `grep "doi.org"` → sed-strip the
  * literal `<ee>https://doi.org/` prefix and `</ee>` suffix →
  * `grep ^10` → sort. Bug-compatible notes: ONLY the https form is
  * stripped, so `http://...` and `dx.doi.org` lines survive the grep
  * but fail the `^10` filter and drop out; duplicates are kept (no
  * `-u`); the trailing sort is a toolchain artifact, not a semantic
  * (the list feeds set-membership joins), so we do not global-sort.
  */
object Dblp {

  /** DOI list from raw XML lines, exactly the reference pipeline. */
  def doiList(lines: DataFrame, lineCol: String): DataFrame =
    lines
      .filter(col(lineCol).contains("doi.org"))
      .select(
        regexp_replace(
          regexp_replace(col(lineCol), lit("<ee>https://doi\\.org/"), lit("")),
          lit("</ee>"), lit("")).as("doi"))
      .filter(col("doi").startsWith("10"))
}
