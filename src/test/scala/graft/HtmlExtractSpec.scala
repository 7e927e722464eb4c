package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.HtmlText
import graft.llm.TextAnalysis

/** The HTML→text extraction contract (graft.plans.HtmlText): stage
  * semantics on constructed documents, the boilerplate line rules,
  * and declarative-vs-native equality — the t16 operator's local
  * truth (its cross-engine truth is the DuckDB oracle). */
class HtmlExtractSpec extends AnyFunSuite {
  import TestSpark.spark

  private def ex(html: String) = HtmlText.extract(html)

  test("scripts, styles and comments vanish — including unclosed-at-EOF") {
    val r = ex("<html><head><title>My Page Title</title>" +
      "<style>body { color: red; }</style>" +
      "<script>var x = 1 < 2 && y > 3;</script></head>" +
      "<body><p>real content stays right here</p>" +
      "<!-- hidden <p>ghost paragraph</p> -->" +
      "<p>more real content after comment</p>" +
      "<script>unclosed script swallows this tail")
    assert(r.text ==
      "My Page Title\nreal content stays right here\n" +
        "more real content after comment")
    assert(r.kept == 3 && r.dropped == 0)
  }

  test("comment removal runs before script removal (chained-pass order)") {
    // The comment eats its body INCLUDING a </script>; the script
    // open tag then runs to the next close (or EOF). Both impls and
    // the oracle share this chained order by contract.
    val r = ex("<p>before everything happened here</p>" +
      "<script>a<!-- weird </script> --></script><p>after it all ended</p>")
    assert(r.text == "before everything happened here\nafter it all ended")
  }

  test("nav/link-menu lines drop on link density; crumbs drop on length") {
    val r = ex("<body><nav><a href='/'>Home</a> <a href='/a'>About</a> " +
      "<a href='/c'>Contact</a></nav>" +
      "<p>OK</p>" + // 1 word: dropped
      "<p>this paragraph has plenty of words to keep</p>" +
      "<div>read the full manual <a href='/m'>here</a> whenever you like</div>")
    assert(r.text == "this paragraph has plenty of words to keep\n" +
      "read the full manual here whenever you like")
    assert(r.kept == 2 && r.dropped == 2)
  }

  test("letterless lines drop; entities decode after stripping") {
    val r = ex("<table><tr><td>1</td><td>2</td><td>3</td><td>4</td></tr>" +
      "</table><p>Tom &amp; Jerry say &lt;hello&gt; &quot;loudly&quot; today</p>")
    // the numeric row: every cell its own line (td is a block tag) of
    // <3 words → dropped as four separate crumbs
    assert(r.text == "Tom & Jerry say <hello> \"loudly\" today")
    assert(r.dropped == 4)
  }

  test("decoded &lt;p&gt; is literal text, never re-stripped; bare < survives") {
    val r = ex("<p>the tag &lt;p&gt; is printable and a < b holds</p>")
    assert(r.text == "the tag <p> is printable and a < b holds")
  }

  test("inline tags strip without line breaks; whitespace collapses") {
    val r = ex("<p>some <b>bold</b>\tand <i>italic</i>\r\nthree words here</p>")
    // \r collapses to a space; \n splits: line 1 "some bold and
    // italic" (kept), line 2 "three words here" (kept)
    assert(r.text == "some bold and italic\nthree words here")
    assert(r.kept == 2 && r.dropped == 0)
  }

  test("null-ish and tagless inputs: plain text is one line under the same rules") {
    assert(ex("") == HtmlText.Extract("", 0, 0))
    assert(ex("just three plain words") ==
      HtmlText.Extract("just three plain words", 1, 0))
    assert(ex("two words") == HtmlText.Extract("", 0, 1))
  }

  test("declarative twin bit-equals the native expression on adversarial fragments") {
    import spark.implicits._
    val frags = Seq(
      "",
      "plain text with no markup at all",
      "<P>UPPERCASE TAGS WORK FINE</P><BR><A HREF='/x'>LINK</A> ok then",
      "<p>a < b and c > d</p><p>x<y>z</y>w keeps going fine</p>",
      "<ul><li>alpha beta gamma</li><li>4 5 6 7</li></ul>",
      "<script src='x.js'>var a = '</p>';</script><p>after script body</p>",
      "<style>p { content: '</p>'; }</style><div>after style block</div>",
      "<!-- unclosed comment to the end <p>gone</p>",
      "<p>tab\tand\rcr collapse</p>\n\n<p>blank lines are structural</p>",
      "&amp;lt; decodes to &lt; not to a bracket pair here",
      "<a>anchor</a> with words around it to keep the line alive",
      "pre\u0001existing sentinel chars only tighten the filter",
      "<td>1</td><td>two</td><td>3</td><td>four</td>",
      "<br/><hr /><p/>self closers are line breaks too ok",
      "<h1>Heading One Stays</h1><h6>tiny heading stays too</h6>",
      "<div class='a' data-x='1 > 0'>attr with gt keeps rest of div</div>")
    val df = frags.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("doc_id", "html")
    def run(native: Boolean) =
      TextAnalysis.htmlExtractStats(df, "html", native = native)
        .select("doc_id", "text", "n_lines_kept", "n_lines_dropped")
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val dec = run(native = false)
    val nat = run(native = true)
    assert(dec == nat, dec.zip(nat).filter(p => p._1 != p._2).take(3))
    // And the native path agrees with the direct function (same code,
    // but through the Catalyst registration).
    val direct = frags.zipWithIndex
      .map { case (h, i) =>
        val r = HtmlText.extract(h)
        (i.toLong, r.text, r.kept.toLong, r.dropped.toLong) }
    assert(nat == direct)
  }
}
