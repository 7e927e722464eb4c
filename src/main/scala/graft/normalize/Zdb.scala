package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ZDB (Zeitschriftendatenbank) — journal short-title → title map.
  *
  * The reference embeds a small Go tool (base64 in the task docstring,
  * ref: sources/zdb.py:86-146) that scans RDF `Description` records
  * carrying `issn[]` / `shortTitle[]` / `title[]` and folds them into
  * `map[short] = title`, also writing a lowercased twin key for
  * case-insensitive matching. Both loops are last-wins: within a
  * record the LAST title survives, across records the LAST record
  * survives. Here the XML decode is a native `from_xml`, and the
  * last-wins fold is a `max_by` aggregation on an explicit record
  * position — one hash shuffle, map-side combinable, no window sort
  * (a sequential fold would not distribute; `max_by` reproduces its
  * result exactly given the position column).
  */
object Zdb {

  val DescriptionSchema: StructType = StructType(Seq(
    StructField("issn", ArrayType(StringType)),
    StructField("shortTitle", ArrayType(StringType)),
    StructField("title", ArrayType(StringType))))

  /** XML `Description` blob column → typed struct `d`. The caller
    * provides `posCol`, the record's position in the source stream —
    * the determinism anchor for last-wins. */
  def parseDescriptions(df: DataFrame, xmlCol: String): DataFrame =
    df.withColumn("d", from_xml(col(xmlCol), DescriptionSchema))

  /** (short → title) map rows. Records without a short title are
    * skipped (Go: `continue`); within a record the last title wins;
    * across records the highest `posCol` wins; every short title also
    * emits its lowercase twin. */
  def shortTitleMap(parsed: DataFrame, posCol: String): DataFrame = {
    val d = col("d")
    val lastTitle = element_at(d("title"), -1)
    parsed
      .filter(size(d("shortTitle")) > 0 && size(d("title")) > 0)
      .select(col(posCol).as("pos"),
        explode(d("shortTitle")).as("s"), lastTitle.as("t"))
      .select(col("pos"), col("t"),
        explode(array(col("s"), lower(col("s")))).as("short"))
      .groupBy("short")
      .agg(max_by(col("t"), col("pos")).as("title"))
  }
}
