package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** The canonical intermediate-schema StructType (SURVEY.md §1): one
  * sparse, nullable row format every source normalizes into.
  * Field set observed in the reference's conversion code
  * (conversions.py:310-335, 477-511, 542-572; openurl.py:45-163;
  * workflows/ai.py:805-822).
  *
  * Column names contain dots (`rft.issn`) — always address them through
  * the [[IS]] constants with backticks, never bare strings.
  */
object Schema {

  val Author: StructType = StructType(Seq(
    StructField("rft.au", StringType),
    StructField("rft.aufirst", StringType),
    StructField("rft.aulast", StringType),
    StructField("rft.aucorp", StringType)))

  val IntermediateSchema: StructType = StructType(Seq(
    StructField("abstract", StringType),
    StructField("authors", ArrayType(Author)),
    StructField("doi", StringType),
    StructField("finc.format", StringType),
    StructField("finc.id", StringType),
    StructField("finc.mega_collection", ArrayType(StringType)),
    StructField("finc.record_id", StringType),
    StructField("finc.source_id", StringType),
    StructField("languages", ArrayType(StringType)),
    StructField("rft.atitle", StringType),
    StructField("rft.date", StringType),
    StructField("rft.eissn", ArrayType(StringType)),
    StructField("rft.genre", StringType),
    StructField("rft.issn", ArrayType(StringType)),
    StructField("rft.issue", StringType),
    StructField("rft.jtitle", StringType),
    StructField("rft.pages", StringType),
    StructField("rft.place", ArrayType(StringType)),
    StructField("rft.pub", ArrayType(StringType)),
    StructField("rft.volume", StringType),
    StructField("subjects", ArrayType(StringType)),
    StructField("url", ArrayType(StringType)),
    StructField("version", StringType),
    StructField("x.date", StringType),
    StructField("x.labels", ArrayType(StringType)),
    StructField("x.oa", BooleanType),
    StructField("x.subtitle", StringType)))

  /** Conform any normalizer output to the canonical column set: every
    * intermediate-schema field present (missing → typed null), in
    * schema order. This is what makes `unionByName` across sources and
    * the export mapping total (SURVEY §1.4 discipline). */
  def conform(df: DataFrame): DataFrame = {
    val have = df.columns.toSet
    df.select(IntermediateSchema.fields.map { f =>
      // Present columns are cast to the canonical type too — a
      // normalizer emitting e.g. a scalar where the schema says array
      // must fail (or coerce) HERE, not at some later unionByName.
      if (have.contains(f.name)) col(s"`${f.name}`").cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Column-name constants; dotted names pre-backticked for col(). */
  object IS {
    val Id = "`finc.id`"
    val RecordId = "`finc.record_id`"
    val SourceId = "`finc.source_id`"
    val Format = "`finc.format`"
    val MegaCollection = "`finc.mega_collection`"
    val Atitle = "`rft.atitle`"
    val Jtitle = "`rft.jtitle`"
    val Genre = "`rft.genre`"
    val Date = "`rft.date`"
    val Issn = "`rft.issn`"
    val Eissn = "`rft.eissn`"
    val Issue = "`rft.issue`"
    val Volume = "`rft.volume`"
    val Pages = "`rft.pages`"
    val Place = "`rft.place`"
    val Pub = "`rft.pub`"
    val XDate = "`x.date`"
    val XLabels = "`x.labels`"
    val XOa = "`x.oa`"
    val XSubtitle = "`x.subtitle`"
  }
}
