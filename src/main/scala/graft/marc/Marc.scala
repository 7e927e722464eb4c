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

  // ---------------------------------------------------------------------
  // Binary MARC (ISO 2709) — the `yaz-marcdump -i marcxml -o marc` leg
  // of the reference's codec (sources/b3kat.py:133-138, the pymarc
  // writer in conversions.py:98-115). Layout per ISO 2709 / MARC21:
  // 24-byte leader (bytes 0-4 record length, 12-16 base address),
  // 12-byte directory entries (tag 3 + length 4 + start 5) terminated
  // by 0x1E, then field data — controlfields as value+0x1E, datafields
  // as ind1 ind2 (0x1F code value)* 0x1E — and a 0x1D record
  // terminator. Lengths and offsets count BYTES (UTF-8), not chars.
  // ---------------------------------------------------------------------

  private val FieldTerm: Byte = 0x1e
  private val RecordTerm: Byte = 0x1d
  private val SubfieldDelim: Byte = 0x1f
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** Encode one record. The leader's length/base digits are recomputed
    * (as every writer does); the remaining leader bytes are preserved,
    * space-padded to 24 when the input leader is short. Throws on
    * fields over 9999 bytes or records over 99999 bytes — the format's
    * own digit-field limits; an oversized record cannot be represented
    * and silently truncating would corrupt the directory. */
  def encodeIso2709(rec: MarcRecord): Array[Byte] = {
    def bytesOf(s: String): Array[Byte] =
      (if (s == null) "" else s).getBytes(Utf8)
    def indByte(s: String): Byte = {
      val b = bytesOf(s)
      if (b.isEmpty) ' '.toByte else b(0)
    }
    val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    val entries = new StringBuilder
    def addField(tag: String, data: Array[Byte]): Unit = {
      // A directory entry is exactly 12 bytes (3 tag + 4 len + 5 start);
      // a 2- or 4-byte tag would silently shift every later entry and
      // only surface as a confusing decode failure — refuse here,
      // mirroring the one-byte subfield-code check below.
      require(tag != null && bytesOf(tag).length == 3,
        s"ISO 2709 tag must be exactly 3 bytes, got '$tag'")
      require(data.length <= 9999,
        s"ISO 2709 field $tag exceeds 9999 bytes (${data.length})")
      entries.append(tag)
        .append(f"${data.length}%04d").append(f"${buf.length}%05d")
      buf ++= data
    }
    rec.controlfields.foreach { c =>
      addField(c.tag, bytesOf(c.value) :+ FieldTerm)
    }
    rec.datafields.foreach { d =>
      val fb = new scala.collection.mutable.ArrayBuffer[Byte]()
      fb += indByte(d.ind1)
      fb += indByte(d.ind2)
      d.subfields.foreach { sf =>
        // A subfield code is exactly one byte on the wire; encoding an
        // empty/multibyte code would silently shift value bytes into
        // the code position on decode — corrupt, so refuse.
        require(sf.code != null && bytesOf(sf.code).length == 1,
          s"ISO 2709 datafield ${d.tag}: subfield code must be one byte, " +
            s"got '${sf.code}'")
        fb += SubfieldDelim
        fb ++= bytesOf(sf.code)
        fb ++= bytesOf(sf.value)
      }
      fb += FieldTerm
      addField(d.tag, fb.toArray)
    }
    val dir = entries.toString.getBytes(Utf8) :+ FieldTerm
    val base = 24 + dir.length
    val total = base + buf.length + 1
    require(total <= 99999, s"ISO 2709 record exceeds 99999 bytes ($total)")
    val padded = ((if (rec.leader == null) "" else rec.leader) + " " * 24)
      .substring(0, 24)
    val leader = f"$total%05d" + padded.substring(5, 12) +
      f"$base%05d" + padded.substring(17, 24)
    leader.getBytes(Utf8) ++ dir ++ buf :+ RecordTerm
  }

  /** Decode one ISO 2709 record. Tags 00x are controlfields (MARC21
    * convention); everything else parses as ind1/ind2 + subfields. */
  def decodeIso2709(bytes: Array[Byte]): MarcRecord = {
    require(bytes.length >= 24, s"ISO 2709 record under 24 bytes (${bytes.length})")
    val leader = new String(bytes, 0, 24, Utf8)
    val base = leader.substring(12, 17).trim.toInt
    val dirEnd = bytes.indexOf(FieldTerm)
    require(dirEnd >= 24, "ISO 2709 directory missing its field terminator")
    val controls = Seq.newBuilder[MarcControlfield]
    val datas = Seq.newBuilder[MarcDatafield]
    (24 until dirEnd by 12).foreach { i =>
      val tag = new String(bytes, i, 3, Utf8)
      val len = new String(bytes, i + 3, 4, Utf8).trim.toInt
      val start = base + new String(bytes, i + 7, 5, Utf8).trim.toInt
      val end0 = start + len
      // drop the trailing field terminator
      val end = if (end0 > start && bytes(end0 - 1) == FieldTerm) end0 - 1 else end0
      if (tag.startsWith("00")) {
        controls += MarcControlfield(tag, new String(bytes, start, end - start, Utf8))
      } else {
        val ind1 = new String(bytes, start, 1, Utf8)
        val ind2 = new String(bytes, start + 1, 1, Utf8)
        val subs = Seq.newBuilder[MarcSubfield]
        var p = start + 2
        while (p < end) {
          require(bytes(p) == SubfieldDelim,
            s"ISO 2709 datafield $tag: expected subfield delimiter at byte $p")
          var q = p + 1
          while (q < end && bytes(q) != SubfieldDelim) q += 1
          val chunk = new String(bytes, p + 1, q - p - 1, Utf8)
          // Two adjacent delimiters (dirty feed) → a code-less chunk;
          // fail with context like the surrounding requires, not a raw
          // StringIndexOutOfBoundsException.
          require(chunk.nonEmpty,
            s"ISO 2709 datafield $tag: empty subfield (adjacent delimiters)")
          subs += MarcSubfield(chunk.substring(0, 1), chunk.substring(1))
          p = q
        }
        datas += MarcDatafield(tag, ind1, ind2, subs.result())
      }
    }
    MarcRecord(leader, controls.result(), datas.result())
  }

  /** Split a concatenated ISO 2709 stream on the leader's own length
    * prefix (never by scanning for 0x1D, which may legally appear
    * inside fixed-field data in dirty feeds). Truncation is an error
    * with stream context, not a silent drop: 1-4 trailing junk bytes
    * and a record cut short by EOF both fail here rather than
    * confusing decodeIso2709 later. */
  def splitIso2709(stream: Array[Byte]): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var off = 0
      def hasNext: Boolean = {
        require(off + 5 <= stream.length || off == stream.length,
          s"ISO 2709 stream: ${stream.length - off} trailing bytes at " +
            s"byte $off (not a length prefix)")
        off < stream.length
      }
      def next(): Array[Byte] = {
        val prefix = new String(stream, off, 5, Utf8)
        require(prefix.forall(_.isDigit),
          s"ISO 2709 stream: non-numeric length prefix '$prefix' at byte $off")
        val len = prefix.toInt
        require(len >= 24, s"ISO 2709 stream: bad record length $len at byte $off")
        require(off + len <= stream.length,
          s"ISO 2709 stream: record at byte $off declares $len bytes but " +
            s"only ${stream.length - off} remain (truncated stream)")
        val rec = stream.slice(off, off + len)
        off += len
        rec
      }
    }

  /** Struct → binary → struct round trip as typed dataset legs —
    * per-partition codec work, the same sanctioned boundary as
    * [[fromMarcXml]]. */
  def toIso2709(ds: Dataset[MarcRecord]): Dataset[Array[Byte]] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map(encodeIso2709)
  }

  def fromIso2709(ds: Dataset[Array[Byte]]): Dataset[MarcRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map(decodeIso2709)
  }
}
