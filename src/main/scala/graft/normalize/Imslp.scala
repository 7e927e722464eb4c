package graft.normalize

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import graft.marc.{Marc, MarcControlfield, MarcDatafield, MarcRecord, MarcSubfield}

/** IMSLP (Petrucci music library, source id 15) XML → MARC normalizer,
  * re-expressing conversions.py:132-210 over the [[MarcRecord]] codec —
  * the encode direction of S9 (the reference builds a pymarc record;
  * here the decoded struct IS the record).
  *
  * One deliberate divergence, documented: the reference iterates a
  * Python `set` for the 689 subject fields (nondeterministic order);
  * this implementation emits them in first-occurrence order so output
  * is stable across runs — same field multiset, deterministic layout.
  */
object Imslp {

  val SourceId = "15"

  /** Optional legacy mapping: IMSLP identifier → (viaf, title). */
  type LegacyMapping = Map[String, (String, String)]

  /** Python str.title() semantics: a letter starts upper iff preceded
    * by a non-letter, otherwise lowercased (conversions.py:198 uses
    * .title() on subjects/arrangements). */
  private[graft] def pyTitle(s: String): String = {
    val sb = new StringBuilder(s.length)
    var prevLetter = false
    s.foreach { c =>
      sb.append(if (c.isLetter && !prevLetter) c.toUpper else c.toLower)
      prevLetter = c.isLetter
    }
    sb.toString
  }

  /** Exactly the named-entity set the reference's html_unescape handles
    * (saxutils.unescape defaults plus quot/apos, conversions.py:67-78);
    * numeric references like `&#39;` stay literal, as there. `&amp;`
    * last so `&amp;lt;` round-trips literally. */
  private[graft] def htmlUnescape(s: String): String =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(s) { case (acc, (ent, ch)) => acc.replace(ent, ch) }

  /** Convert one IMSLP XML document string to a MARC record.
    * Field-for-field port of conversions.py:132-210; a record without a
    * title is an error there and throws here. */
  def xmlToMarc(xml: String,
                legacy: LegacyMapping = Map.empty): MarcRecord = {
    val root = scala.xml.XML.loadString(xml)
    val doc = if (root.label == "document") root
              else (root \\ "document").head

    def text(label: String): Option[String] = {
      val n = doc \ label
      if (n.isEmpty) None else Some(n.head.text)
    }
    def mainForm(label: String): Option[String] =
      (doc \ label \ "mainForm").headOption.map(_.text)

    val identifier = (doc \ "identifier").head.text
    val encodedId = java.util.Base64.getEncoder
      .encodeToString(identifier.getBytes("UTF-8"))
      .replaceAll("=+$", "")

    val title = text("title").getOrElse(
      throw new IllegalArgumentException(
        s"cannot find title: ${xml.take(300)} ..."))

    val langs = (doc \ "languages").map(_.text).filter(_ != "unbekannt")
    val date = text("date").getOrElse("")
    val arrangement = text("music_arrangement_of").getOrElse("")

    val subjects = (doc \ "subject" \ "mainForm").map(_.text)
    val subjectHead = subjects.size match {
      case 0 => None
      case 1 => Some(subjects(0))
      case 2 => Some(subjects(1)) // reference keeps the SECOND of two
      case n => throw new IllegalArgumentException(s"cannot handle $n subjects")
    }

    val (viaf, legacyTitle) = legacy.getOrElse(identifier, ("", ""))

    // marcx in non-strict mode (record.strict = False,
    // conversions.py:148) drops falsy subfield values — empty strings
    // never become subfields; a field whose subfields are all empty is
    // not added at all.
    def df(tag: String, subs: (String, String)*): Option[MarcDatafield] = {
      val kept = subs.collect { case (c, v) if v.nonEmpty => MarcSubfield(c, v) }
      if (kept.isEmpty) None else Some(MarcDatafield(tag, " ", " ", kept))
    }

    val controls = Seq(
      Some(MarcControlfield("001", s"finc-15-$encodedId")),
      Some(MarcControlfield("007", "cr")),
      langs.headOption.map(l =>
        MarcControlfield("008", s"130227uu20uuuuuuxx uuup$l  c"))).flatten

    val subjectFields: Seq[Option[MarcDatafield]] = subjectHead match {
      case None => Seq.empty
      case Some(subj) =>
        val for689 = (Seq(subj, arrangement)).distinct
        df("590", "a" -> pyTitle(subj), "b" -> pyTitle(arrangement)) +:
          for689.map(s => df("689", "a" -> pyTitle(s)))
    }

    // The reference indexes doc["creator"]["mainForm"] unconditionally
    // (conversions.py:168) — a creator-less record is a hard conversion
    // failure there, so it is here too.
    val creator = mainForm("creator").getOrElse(
      throw new IllegalArgumentException(
        s"cannot find creator mainForm: ${xml.take(300)} ..."))

    val datas = (
      langs.map(l => df("041", "a" -> l)) ++ Seq(
        df("100", "a" -> creator, "e" -> "cmp",
           "0" -> viaf),
        df("240", "a" -> legacyTitle),
        df("245", "a" -> htmlUnescape(title)),
        df("246", "a" -> htmlUnescape(text("additionalTitle").getOrElse(""))),
        df("260", "c" -> date),
        df("650", "y" -> date),
        df("500", "a" -> text("abstract").getOrElse(""))) ++
      subjectFields ++ Seq(
        df("700", "a" -> mainForm("contributor").getOrElse(""), "e" -> "ctb"),
        df("856", "q" -> "text/html", "3" -> "Petrucci Musikbibliothek",
           "u" -> (doc \ "url").head.text),
        df("970", "c" -> "PN"),
        df("980", "a" -> identifier, "b" -> SourceId,
           "c" -> "Petrucci Musikbibliothek"))).flatten

    MarcRecord("     ncs  22        450 ", controls, datas)
  }

  /** Table-level conversion: one XML string column in, MarcRecord
    * Dataset out (per-partition codec work, the sanctioned imperative
    * boundary — SURVEY §7.3). */
  def fromXml(df: DataFrame, xmlCol: String,
              legacy: LegacyMapping = Map.empty): Dataset[MarcRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(xmlCol)).as[String].map(xmlToMarc(_, legacy))
  }
}
