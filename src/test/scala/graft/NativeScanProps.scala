package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import graft.llm.TextAnalysis

/** ScalaCheck properties pinning the native single-pass scan
  * expressions bit-identical to their declarative twins on RANDOM
  * text — whitespace runs, unicode letters/digits, supplementary-
  * plane code points, bullets/ellipses/hashes, pathological token
  * shapes the fixed-edge spec cases can't enumerate. Each case is a
  * tiny Spark job, so sample counts stay small (the fixed-fixture
  * parity pins in DedupSpec cover the corpus-shaped bulk). */
object NativeScanProps extends Properties("NativeScan") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(12)

  // Tokens mixing ASCII, accented/CJK letters, digits, punctuation,
  // an emoji (letterless non-ASCII), and supplementary-plane chars.
  private val token: Gen[String] = Gen.chooseNum(1, 6).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf(
      Gen.alphaLowerChar.map(_.toString), Gen.numChar.map(_.toString),
      Gen.oneOf("é", "東", "Δ", "😀", "𐀀", "￿", "#", ".", "…", "-",
        "*", "•", "@"))).map(_.mkString))
  // Separators: every regex-\s char plus runs; texts may lead/trail
  // with them (the leading-""-token / trailing-empty-line edges).
  private val sep: Gen[String] = Gen.chooseNum(1, 3).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf(" ", "\t", "\n", "\u000b", "\f", "\r"))
      .map(_.mkString))
  private val text: Gen[String] = for {
    lead <- Gen.oneOf(Gen.const(""), sep)
    n <- Gen.chooseNum(0, 10)
    body <- Gen.listOfN(n, Gen.zip(token, sep).map(t => t._1 + t._2))
    trail <- Gen.oneOf(Gen.const(""), sep)
  } yield lead + body.map(identity).mkString + trail

  private def gates(texts: Seq[String], native: Boolean) =
    TextAnalysis.funnelStats(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        "text", minWords = 2, minStopHits = 0, native = native)
      .select(col("doc_id"), col("rep_keep"), col("gop_keep"),
        col("quality"), col("fp"))
      .as[(Long, Option[Boolean], Boolean, Option[Double], Option[String])]
      .collect().sortBy(_._1).toSeq

  property("funnel_gates bit-equals the declarative funnelStats") =
    Prop.forAll(Gen.listOfN(6, text)) { texts =>
      gates(texts, native = true) == gates(texts, native = false)
    }

  private def ngrams(texts: Seq[String], n: Int, native: Boolean) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out =
      if (native) {
        graft.plans.NgramHashesExpr.register(spark)
        df.select(col("doc_id"),
          call_function("ngram_hashes", col("text"), lit(n)).as("ng"))
      } else df
        // hashNgrams over staged tokens (the declarative form).
        .select(col("doc_id"),
          explode(array(graft.functions.Scalars.tokens(col("text"))))
            .as("__t"))
        .select(col("doc_id"),
          TextAnalysis.hashNgrams(col("__t"), n).as("ng"))
    out.as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
  }

  property("ngram_hashes bit-equals hashNgrams (n in 2..4)") =
    Prop.forAll(Gen.listOfN(5, text), Gen.chooseNum(2, 4)) { (texts, n) =>
      ngrams(texts, n, native = true) == ngrams(texts, n, native = false)
    }

  // Random tag soup for the HTML extractor: unbalanced/open-ended
  // tags, stray angle brackets, entities (incl. double-escapes),
  // comments/scripts that may never close, sentinel chars in source
  // text, tabs/CRs/newlines — the crawl reality the fixed fragments
  // in HtmlExtractSpec can't enumerate.
  private val soupPiece: Gen[String] = Gen.oneOf(
    token, sep,
    Gen.oneOf("<p>", "</p>", "<div class='a'>", "</div>", "<br/>",
      "<li>", "</li>", "<h2>", "</h2>", "<td>", "</td>",
      "<a href='/x'>", "<a>", "</a>", "<b>", "</b>", "<span x>",
      "</span>", "<P >", "</ P>", "<!doctype html>",
      "<script>", "</script>", "<style>", "</style>",
      "<!--", "-->", "<", ">", "</", "/>",
      "&amp;", "&lt;", "&gt;", "&quot;", "&apos;", "&amp;lt;", "&bogus;",
      "\u0001", "\t", "\r", "\n"))
  private val soup: Gen[String] = Gen.chooseNum(0, 40)
    .flatMap(n => Gen.listOfN(n, soupPiece).map(_.mkString))

  property("html extractor is total on tag soup") =
    Prop.forAll(soup) { html =>
      val r = graft.plans.HtmlText.extract(html) // must not throw
      r.kept >= 0 && r.dropped >= 0 &&
        (r.text.isEmpty || r.kept > 0) // emitted text implies kept lines
    }

  private def extract(htmls: Seq[String], native: Boolean) =
    TextAnalysis.htmlExtractStats(
        htmls.zipWithIndex.map { case (h, i) => (i.toLong, h) }
          .toDF("doc_id", "html"), "html", native = native)
      .select("doc_id", "text", "n_lines_kept", "n_lines_dropped")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq

  property("html_extract bit-equals the declarative htmlExtractStats") =
    Prop.forAll(Gen.listOfN(5, soup)) { htmls =>
      extract(htmls, native = true) == extract(htmls, native = false)
    }
}
