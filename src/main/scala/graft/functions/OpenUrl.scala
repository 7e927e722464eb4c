package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F12 — OpenURL (Z39.88 KEV) link builder over intermediate-schema
  * columns, re-expressing openurl.py:31-175 as one codegen'd
  * expression: genre-dispatched parameter assembly, null-dropping, and
  * form-urlencoding (url_encode = application/x-www-form-urlencoded,
  * matching Python's urlencode).
  */
object OpenUrl {

  val DefaultBase = "http://www.redi-bw.de/links/ubl?rl_site=ubl&"
  val DefaultRfrId = "www.ub.uni-leipzig.de"

  private def pair(k: String, v: Column): Column =
    when(v.isNotNull, concat(lit(k + "="), url_encode(v.cast("string"))))

  private def kev(pairs: Seq[(String, Column)]): Column =
    concat_ws("&", array_compact(array(pairs.map { case (k, v) => pair(k, v) }: _*)))

  /** Build the OpenURL query string. Column arguments follow the
    * intermediate schema; arrays (issn, languages, pub) contribute
    * their first element like the reference's `update_on_value`. */
  def queryString(
      genre: Column, recordId: Column, doi: Column, atitle: Column,
      jtitle: Column, date: Column, issns: Column, eissns: Column,
      isbns: Column, volume: Column, issue: Column, pages: Column,
      places: Column, pubs: Column, languages: Column, authors: Column,
      fincFormat: Column, rfrId: String = DefaultRfrId): Column = {

    val g = coalesce(genre, lit("article"))
    // proceeding is linked like an article (openurl.py:73-74).
    val eff = when(g === "proceeding", "article").otherwise(g)
    val author = try_element_at(authors, lit(1))
    def au(field: String): Column = author.getField(field)
    // Falsy check like the reference's `if doc.get("doi"):` — an
    // empty-string DOI falls back to the record id, never a dangling
    // `info:doi/` (openurl.py:149).
    val rftId = when(doi.isNotNull && doi =!= "", concat(lit("info:doi/"), doi))
      .otherwise(recordId)

    val common: Seq[(String, Column)] = Seq(
      "url_ver" -> lit("Z39.88-2004"),
      "ctx_ver" -> lit("Z39.88-2004"),
      "ctx_enc" -> lit("info:ofi/enc:UTF-8"),
      "rfr_id" -> lit(s"info:sid/$rfrId:generator"),
      "rft.date" -> date,
      "rft.language" -> try_element_at(languages, lit(1)),
      "rft.place" -> when(places.isNotNull, array_join(places, ", ")))

    val authorPairs: Seq[(String, Column)] = Seq(
      "rft.au" -> au("rft.au"), "rft.aucorp" -> au("rft.aucorp"),
      "rft.aufirst" -> au("rft.aufirst"), "rft.aulast" -> au("rft.aulast"))

    // Reference sets no rft_val_fmt for articles (only the book/else
    // branches carry one — openurl.py:74-131).
    // rft.genre carries the document's RAW genre (null-dropped) — a
    // proceeding linked through the article branch still says
    // `rft.genre=proceeding`, and a genre-less record emits no genre
    // param (openurl.py:148: update_on_value from doc, not the
    // coalesced branch selector).
    val article = kev(common ++ Seq(
      "rft.genre" -> genre,
      "rft_id" -> rftId,
      "rft.atitle" -> atitle,
      "rft.jtitle" -> jtitle,
      "rft.issn" -> try_element_at(issns, lit(1)),
      "rft.eissn" -> try_element_at(eissns, lit(1)),
      "rft.volume" -> volume,
      "rft.issue" -> issue,
      "rft.pages" -> pages) ++ authorPairs)

    // isbn comes from the record's own isbn field and eissn is emitted
    // separately (openurl.py:86-90) — not isbn-from-eissn. The book
    // branch also carries rft.atitle and rft.issue (openurl.py:85,95):
    // a book-genre record with a chapter title emits both btitle and
    // atitle.
    val book = kev(common ++ Seq(
      "rft_val_fmt" -> lit("info:ofi/fmt:kev:mtx:book"),
      "rft.genre" -> lit("book"),
      "rft_id" -> rftId,
      "rft.btitle" -> atitle,
      "rft.atitle" -> atitle,
      "rft.isbn" -> try_element_at(isbns, lit(1)),
      "rft.issn" -> try_element_at(issns, lit(1)),
      "rft.eissn" -> try_element_at(eissns, lit(1)),
      "rft.volume" -> volume,
      "rft.pages" -> pages,
      "rft.issue" -> issue,
      "rft.pub" -> try_element_at(pubs, lit(1))) ++ authorPairs)

    // Journal branch (openurl.py:155-156): the common rft.title (from
    // atitle) stays, only the ISSN is added — no genre parameter.
    val journal = kev(common ++ Seq(
      "rft.title" -> atitle,
      "rft.issn" -> try_element_at(issns, lit(1))))

    // No rft.creator: the reference reads a DOC-level "rft.au" for it
    // (openurl.py:160-161), a key the intermediate schema never carries
    // (authors are structs), so the parameter is effectively never
    // emitted — emitting the first author here would diverge.
    val fallback = kev(common ++ Seq(
      "rft_val_fmt" -> lit("info:ofi/fmt:kev:mtx:book"),
      "rft.title" -> atitle,
      "rft.pub" -> try_element_at(pubs, lit(1)),
      "rft.format" -> fincFormat))

    when(eff === "article", article)
      .when(eff === "book", book)
      .when(eff === "journal", journal)
      .otherwise(fallback)
  }

  /** Full resolver link. */
  def link(qs: Column, base: String = DefaultBase): Column =
    concat(lit(base), qs)
}
