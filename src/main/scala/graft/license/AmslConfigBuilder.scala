package graft.license

import scala.collection.mutable

/** P8 — the 8-case AMSL discovery-row dispatch that builds the per-ISIL
  * filter config (ref: sources/amsl.py:874-1361, case table at 924-935).
  *
  * Driver-side and tiny (10^3–10^4 rows) — this is config compilation,
  * not data-plane work, so plain Scala collections are the right tool
  * (the reference reaches the same conclusion with Python dicts).
  *
  * Case table (SID/COLL/ISIL always present; o = optional TCID; rows
  * with a holdings link and evaluate=no are skipped like the
  * reference's warning path; any combination outside the table —
  * including productISIL on a content-file row — raises
  * [[AmslConfigBuilder.UnhandledAmslRow]]):
  * {{{
  *   LTHF LTCF ELTCF PI   action
  *   -    -    -     -    collect (sid → collections)
  *   -    -    -     X    collect, productISIL ignored
  *   X    -    -     -    holdings-link bucket (if evaluate=yes)
  *   X    -    -     X    holdings-link bucket (if evaluate=yes)
  *   -    X    -     -    AND(source, holdings(contentFile))
  *   -    -    X     -    AND(source, holdings(externalContentFile))
  *   X    -    X     -    AND(source, holdings(ext), holdings(lthf)) (if evaluate=yes)
  *   X    X    -     -    AND(source, holdings(ltcf), holdings(lthf)) (if evaluate=yes)
  * }}}
  * Collected (isil, sid) → collections become AND(source, collection);
  * holdings-link buckets become AND(source, collection, holdings(link))
  * — except source 49 (Crossref), where the collection list is dropped
  * (too broad to enumerate; amsl.py:1283-1313).
  */
case class AmslRow(
    isil: String,
    sourceId: String,
    megaCollection: String,
    technicalCollectionID: Option[String] = None,
    linkToHoldingsFile: Option[String] = None,
    linkToContentFile: Option[String] = None,
    externalLinkToContentFile: Option[String] = None,
    productISIL: Option[String] = None,
    evaluateHoldingsFileForLibrary: Option[String] = None)

object AmslConfigBuilder {
  import FilterExpr._

  /** Source ids whose collection lists are dropped from compiled filters
    * (reference hardwires Crossref = "49"). */
  val BroadSources: Set[String] = Set("49")

  private def nonEmpty(o: Option[String]): Option[String] =
    o.map(_.trim).filter(_.nonEmpty)

  case class UnhandledAmslRow(row: AmslRow)
      extends RuntimeException(s"unhandled combination: $row")

  def build(rows: Seq[AmslRow]): Map[String, FilterExpr] = {
    // (isil, sid) → collection names, for link-free rows
    val sidColls = mutable.LinkedHashMap.empty[(String, String), mutable.LinkedHashSet[String]]
    // (isil, sid, holdingsLink) → collection names
    val linkColls = mutable.LinkedHashMap.empty[(String, String, String), mutable.LinkedHashSet[String]]
    val filters = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[FilterExpr]]

    def addFilter(isil: String, f: FilterExpr): Unit =
      filters.getOrElseUpdate(isil, mutable.ArrayBuffer.empty) += f

    rows.foreach { row =>
      val lthf = nonEmpty(row.linkToHoldingsFile)
      val ltcf = nonEmpty(row.linkToContentFile)
      val eltcf = nonEmpty(row.externalLinkToContentFile)
      val evaluate = row.evaluateHoldingsFileForLibrary.contains("yes")
      val colls = Seq(row.megaCollection) ++ nonEmpty(row.technicalCollectionID)

      // Only the link-free and holdings-link cases tolerate productISIL
      // (amsl.py cases 1-4); every content-file case requires it absent
      // (dictcheck absent=[..., "productISIL"], amsl.py:1163-1254) —
      // such rows fall through to the reference's RuntimeError.
      val pi = nonEmpty(row.productISIL)
      (lthf, ltcf, eltcf) match {
        case (None, None, None) => // with or without productISIL: collect
          sidColls.getOrElseUpdate((row.isil, row.sourceId),
            mutable.LinkedHashSet.empty) ++= colls
        case (Some(link), None, None) => // with or without productISIL
          if (evaluate)
            linkColls.getOrElseUpdate((row.isil, row.sourceId, link),
              mutable.LinkedHashSet.empty) ++= colls
          // evaluate=no + link → skip (reference logs a warning)
        case (None, Some(content), None) if pi.isEmpty =>
          addFilter(row.isil,
            And(Seq(SourceIn(Seq(row.sourceId)), Holdings(Seq(content)))))
        case (None, None, Some(ext)) if pi.isEmpty =>
          addFilter(row.isil,
            And(Seq(SourceIn(Seq(row.sourceId)), Holdings(Seq(ext)))))
        case (Some(link), None, Some(ext)) if pi.isEmpty =>
          if (evaluate)
            addFilter(row.isil, And(Seq(SourceIn(Seq(row.sourceId)),
              Holdings(Seq(ext)), Holdings(Seq(link)))))
        case (Some(link), Some(content), None) if pi.isEmpty =>
          if (evaluate)
            addFilter(row.isil, And(Seq(SourceIn(Seq(row.sourceId)),
              Holdings(Seq(content)), Holdings(Seq(link)))))
        case _ => throw UnhandledAmslRow(row)
      }
    }

    // Pass 2: collected link-free collections → AND(source, collection);
    // broad sources (49) contribute no filter here (reference: pass).
    sidColls.foreach { case ((isil, sid), colls) =>
      if (!BroadSources.contains(sid))
        addFilter(isil,
          And(Seq(SourceIn(Seq(sid)), CollectionIn(colls.toSeq.sorted))))
    }

    // Pass 3: holdings-link buckets → AND(source, collection, holdings);
    // broad sources keep only (source, holdings).
    linkColls.foreach { case ((isil, sid, link), colls) =>
      val base =
        if (BroadSources.contains(sid))
          Seq(SourceIn(Seq(sid)), Holdings(Seq(link)))
        else
          Seq(SourceIn(Seq(sid)), CollectionIn(colls.toSeq.sorted),
              Holdings(Seq(link)))
      addFilter(isil, And(base))
    }

    filters.collect {
      case (isil, fs) if fs.nonEmpty =>
        isil -> (if (fs.size == 1) fs.head else Or(fs.toSeq))
    }.toMap
  }
}
