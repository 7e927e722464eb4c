package graft.marc

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S9 — MARC record codec and accessors (SURVEY §1.1, §2.1 S9, §2.2
  * P7). Records live as one nested struct per row —
  * `Dataset[MarcRecord]` — so every downstream predicate/projection is
  * a codegen'd array expression, not a per-record parser call.
  *
  * Decoding MARCXML/MAB-XML happens once at the source boundary with a
  * plain Scala XML parser (`Dataset.map` — a codec is per-partition
  * imperative work, the one sanctioned mapPartitions-style use, SURVEY
  * §7.3); everything after is columnar.
  */
case class MarcSubfield(code: String, value: String)
case class MarcDatafield(tag: String, ind1: String, ind2: String,
                         subfields: Seq[MarcSubfield])
case class MarcControlfield(tag: String, value: String)
case class MarcRecord(leader: String,
                      controlfields: Seq[MarcControlfield],
                      datafields: Seq[MarcDatafield])

object Marc {

  /** Parse one MARCXML `<record>` element (namespace-agnostic — plain,
    * `marc:`-prefixed, and MAB-XML-shaped input all carry tag/code as
    * attributes). */
  def parseRecordXml(xml: String): MarcRecord = {
    val root = scala.xml.XML.loadString(xml)
    val rec = if (root.label == "record") root
              else (root \\ "record").headOption.getOrElse(root)
    val leader = (rec \ "leader").text
    val controls = (rec \ "controlfield").map { n =>
      MarcControlfield((n \@ "tag"), n.text)
    }
    val datas = (rec \ "datafield").map { n =>
      MarcDatafield(
        n \@ "tag", n \@ "ind1", n \@ "ind2",
        (n \ "subfield").map(s => MarcSubfield(s \@ "code", s.text)))
    }
    MarcRecord(leader, controls, datas)
  }

  /** Decode a DataFrame column of MARCXML record strings. */
  def fromMarcXml(df: DataFrame, xmlCol: String): Dataset[MarcRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(xmlCol)).as[String].map(parseRecordXml)
  }

  /** Split a concatenated MARCXML collection string into per-record
    * elements via the streaming tag scanner (utils.py:448-507 parity —
    * no DOM of the full collection, so multi-GB inputs don't
    * materialize twice; records come out as raw substrings). */
  def splitCollection(xml: String): Seq[String] =
    graft.sources.Xml.splitByTag(xml, "record").toSeq

  /** All values of `tag.code` (e.g. "084.a"), as an array column over
    * the nested record — marcx `record.values()` semantics
    * (ref: sources/b3kat.py:190-202). */
  def values(spec: String): Column = {
    val parts = spec.split("\\.", 2)
    require(parts.length == 2,
      s"""Marc.values expects a "tag.code" spec (e.g. "245.a"), got "$spec"""")
    val Array(tag, code) = parts
    flatten(transform(
      filter(col("datafields"), f => f.getField("tag") === tag),
      f => transform(
        filter(f.getField("subfields"), s => s.getField("code") === code),
        s => s.getField("value"))))
  }

  /** Value of a controlfield tag (001, 003, …), first occurrence. */
  def controlValue(tag: String): Column =
    try_element_at(transform(
      filter(col("controlfields"), f => f.getField("tag") === tag),
      f => f.getField("value")), lit(1))

  /** P7 — predicate: some `tag.code` subfield equals `value`. */
  def contains(spec: String, value: String): Column =
    array_contains(values(spec), value)

  /** The reference's SSG slice filter (sources/b3kat.py:190-202):
    * 084.2=ssgn ∧ 084.a=<ssg> ∧ 912.a=digit. */
  def ssgFilter(ds: Dataset[MarcRecord], ssg: String): Dataset[MarcRecord] =
    ds.filter(contains("084.2", "ssgn") && contains("084.a", ssg) &&
              contains("912.a", "digit"))
}
