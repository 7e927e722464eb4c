package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → main-content text extraction: the crawl front door every
  * web-scale curation pipeline (CCNet, RefinedWeb, Gopher/MassiveText)
  * runs BEFORE any quality/dedup/language operator sees the text.
  * The reference never needed it — scholarly metadata arrives
  * structured — but the training-data mandate's corpora are crawls.
  *
  * The SEMANTICS are a fixed, engine-replayable pipeline (every stage
  * expressible as chained regex replaces + per-line arithmetic, so the
  * whole operator can sit under the DuckDB hash oracle):
  *
  *  A. strip non-content blocks, case-insensitive, dot-matches-newline,
  *     an unclosed block runs to end-of-input (crawls truncate):
  *     comments `<!-- … -->`, then `<script…>…</script>`, then
  *     `<style…>…</style>` — three chained global passes in THAT
  *     order (so a comment-wrapped script is gone either way);
  *  B. mark anchor OPEN tags `<a …>` with the sentinel U+0001 (the
  *     link-density signal must survive tag stripping), convert
  *     block-level tags (open or close) to newline, strip every
  *     remaining tag `<[/!]?[letter]…>` (a bare `<` in prose — "a < b"
  *     — is NOT a tag and survives);
  *  C. decode the five XML/HTML core entities in [[HtmlText.Entities]]
  *     order (the [[graft.functions.Scalars.htmlUnescape]] table —
  *     decode AFTER stripping, so "&lt;b&gt;" renders as literal text
  *     and is never re-stripped);
  *  D. collapse horizontal whitespace runs `[ \t\r]+` to one space;
  *  E. per line (split on \n, trimmed; EMPTY lines are structural and
  *     count as neither kept nor dropped): with words = the
  *     marker-removed space-split tokens, links = sentinel count,
  *     alpha = words containing a letter, a line is KEPT iff
  *     `n_words >= 3 AND 2·links <= n_words AND 2·alpha >= n_words`
  *     — the boilerplate rules: nav crumbs are short, link menus have
  *     ≈1 anchor per word, spacer/number rows carry no letters.
  *
  * Output: struct(text = kept lines joined by \n (markers removed,
  * re-collapsed, trimmed), n_lines_kept, n_lines_dropped); null input
  * → null struct.
  *
  * [[HtmlExtractExpr]] (`html_extract`) runs the whole pipeline as one
  * compiled eval per document — stages A/B share the exact
  * [[HtmlText]] patterns with the declarative twin
  * ([[graft.llm.TextAnalysis.htmlExtractStats]]), stages C–E are a
  * single char scan replacing the twin's per-line HOF lambdas (the
  * [[FunnelGatesExpr]] split: HOF lambdas evaluate interpreted,
  * per-token). TextAnalysisSpec pins the two forms equal
  * column-for-column, including adversarial fragments. */
object HtmlText {

  /** Block-level tags whose open AND close both become a line break.
    * Fixed public list — part of the operator contract (and of every
    * oracle), not a tunable. */
  val BlockTags: Seq[String] = Seq(
    "p", "div", "br", "hr", "li", "ul", "ol",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "table", "tr", "td", "th", "blockquote", "pre",
    "section", "article", "header", "footer", "nav", "title", "form")

  /** Anchor sentinel: survives tag stripping so stage E can compute
    * per-line link density. U+0001 cannot appear in sane crawl text;
    * pre-existing occurrences are absorbed into the link count (they
    * only make the filter stricter). */
  val Marker = '\u0001'

  // The Java/RE2 COMMON regex subset, deliberately: no \b (Unicode
  // semantics differ), `(\s[^>]*)?` instead (matches `<a>` and
  // `<a href=…>` but not `<abbr>`), `\z`-vs-`$` handled per engine
  // (RE2's `$` without the m flag IS end-of-text; Java's `$` matches
  // before a trailing newline, so the Java side says \z explicitly).
  val CommentPat: String = "(?s)<!--.*?(-->|\\z)"
  val ScriptPat: String = "(?is)<script(\\s[^>]*)?>.*?(</script\\s*>|\\z)"
  val StylePat: String = "(?is)<style(\\s[^>]*)?>.*?(</style\\s*>|\\z)"
  val AnchorPat: String = "(?i)<a(\\s[^>]*)?>"
  val BlockPat: String =
    "(?i)</?(" + BlockTags.mkString("|") + ")(\\s[^>]*)?/?>"
  val TagPat: String = "<[/!]?[a-zA-Z][^>]*>"

  /** DuckDB (RE2) spellings of the same patterns: flags ride separately
    * ('gis'), end-of-input is `$`. Used by the oracle SQL builders. */
  def re2(javaPat: String): String = javaPat
    .replace("(?is)", "").replace("(?i)", "").replace("(?s)", "")
    .replace("\\z", "$")

  /** Entity decode table, in REPLACE ORDER (&amp; last, so "&amp;lt;"
    * decodes to "&lt;" not "<") — the f2 htmlUnescape table. */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&apos;" -> "'", "&amp;" -> "&")

  private val commentRe = Pattern.compile(CommentPat)
  private val scriptRe = Pattern.compile(ScriptPat)
  private val styleRe = Pattern.compile(StylePat)
  private val anchorRe = Pattern.compile(AnchorPat)
  private val blockRe = Pattern.compile(BlockPat)
  private val tagRe = Pattern.compile(TagPat)

  final case class Extract(text: String, kept: Int, dropped: Int)

  /** The full pipeline over one document. Stages A/B via the shared
    * compiled patterns (identical to the declarative twin by
    * construction); C–E one hand-written scan. */
  def extract(html: String): Extract = {
    var s = commentRe.matcher(html).replaceAll("")
    s = scriptRe.matcher(s).replaceAll("")
    s = styleRe.matcher(s).replaceAll("")
    s = anchorRe.matcher(s).replaceAll(Marker.toString)
    s = blockRe.matcher(s).replaceAll("\n")
    s = tagRe.matcher(s).replaceAll("")
    var i = 0
    Entities.foreach { case (e, c) => s = s.replace(e, c) }

    val out = new java.lang.StringBuilder(s.length)
    val line = new java.lang.StringBuilder(128)
    var kept = 0
    var dropped = 0
    val len = s.length
    while (i <= len) {
      // One line: [i, j) up to the next \n or end-of-input.
      var j = i
      while (j < len && s.charAt(j) != '\n') j += 1
      // Single scan computing the stage-D/E signals: words and the
      // emitted text are over the MARKER-REMOVED, space-collapsed,
      // trimmed line; the sentinel is invisible (it neither starts,
      // ends, nor splits a word — exactly `replace(l, chr(1), '')`
      // before the split), and any [ \t\r] run is one separator.
      line.setLength(0)
      var nWords = 0
      var nAlpha = 0
      var nLinks = 0
      var inWord = false
      var wordHasAlpha = false
      var pendingSpace = false
      var sawContent = false // any non-[ \t\r] char, markers included
      var k = i
      while (k < j) {
        val c = s.charAt(k)
        if (c == ' ' || c == '\t' || c == '\r') {
          inWord = false
          pendingSpace = true
        } else if (c == Marker) {
          nLinks += 1
          sawContent = true
        } else {
          sawContent = true
          if (!inWord) {
            inWord = true
            nWords += 1
            wordHasAlpha = false
            if (pendingSpace && line.length > 0) line.append(' ')
            pendingSpace = false
          }
          // codePointAt: a supplementary-plane letter (surrogate pair)
          // is one \p{L} match to the regex twin and must be one here.
          if (!wordHasAlpha && Character.isLetter(s.codePointAt(k))) {
            wordHasAlpha = true
            nAlpha += 1
          }
          line.append(c)
        }
        k += 1
      }
      if (sawContent) {
        if (nWords >= 3 && 2 * nLinks <= nWords && 2 * nAlpha >= nWords) {
          if (kept > 0) out.append('\n')
          out.append(line)
          kept += 1
        } else dropped += 1
      }
      i = j + 1
    }
    Extract(out.toString, kept, dropped)
  }
}

/** `html_extract(html)` → struct(text, n_lines_kept, n_lines_dropped)
  * — see [[HtmlText]] for the contract. CodegenFallback: one eval per
  * DOCUMENT; the scan inside is the work. */
case class HtmlExtractExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"html_extract expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = HtmlExtractExpr.Schema
  override def nullable: Boolean = true
  override def prettyName: String = HtmlExtractExpr.Name

  override protected def nullSafeEval(input: Any): Any = {
    val r = HtmlText.extract(input.asInstanceOf[UTF8String].toString)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(r.text), r.kept, r.dropped))
  }

  override protected def withNewChildInternal(
      newChild: Expression): HtmlExtractExpr = copy(child = newChild)
}

object HtmlExtractExpr {
  val Name = "html_extract"
  val Schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_lines_kept", IntegerType, nullable = false),
    StructField("n_lines_dropped", IntegerType, nullable = false)))
  private[plans] val info =
    new ExpressionInfo(classOf[HtmlExtractExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 1,
      s"html_extract expects 1 argument (html), got ${children.size}")
    HtmlExtractExpr(children.head)
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}
