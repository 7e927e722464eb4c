package graft.plans

import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL PDF text extraction, pure JDK: documents are the other big
  * binary modality of a training-data crawl (after images/AV), and
  * the JDK ships everything the common case needs — /FlateDecode is
  * zlib (`java.util.zip.Inflater`), and text content streams are a
  * small operator language. Same discipline as the ISO-BMFF/RIFF
  * decoders: implemented from the public spec (ISO 32000-1), total
  * (parse-or-null, crawls truncate), fixtures muxed by [[PdfCodec]]
  * itself writing genuine bytes any PDF reader opens.
  *
  * SCOPE, stated truthfully: Flate-or-raw content streams and the
  * string/positioning operators (`Tj`, `'`, `"`, `TJ` arrays, literal
  * strings with escapes/nesting/octal, hex strings, `Td`/`TD`/`T*`
  * line moves). That covers generated/simple PDFs — the
  * text-extraction analog of "MJPEG in both containers". Encrypted
  * PDFs, CID/Type0 composite fonts with custom CMaps, and non-Flate
  * filters (DCT, LZW, …) yield null/empty like the H.264 seam: a
  * deployment adds a full renderer behind the same struct contract.
  *
  * Extraction semantics (fixed, oracle-replayable):
  *  - each stream object whose preceding dict mentions /FlateDecode
  *    is inflated (failure → stream skipped); others are taken raw;
  *  - within a stream, every shown string (Tj / ' / " / TJ elements)
  *    appends its decoded bytes (ISO-8859-1 — StandardEncoding's
  *    printable range) to the current line; `Td`/`TD`/`T*`/`'` start
  *    a new line;
  *  - streams contribute in file order, joined by newline; runs of
  *    newlines collapse; leading/trailing newlines trimmed;
  *  - `n_pages` = count of `/Type /Page` page objects (not /Pages);
  *    `version` from the `%PDF-x.y` header; not a PDF → null. */
object PdfCodec {

  final case class Extract(text: String, pages: Int, version: String)

  // ---- extraction ----

  def extract(bytes: Array[Byte]): Extract = {
    if (bytes.length < 8) return null
    val raw = new String(bytes, "ISO-8859-1")
    if (!raw.startsWith("%PDF-")) return null
    val version = raw.substring(5, math.min(8, raw.length))
      .takeWhile(c => c.isDigit || c == '.')
    if (version.isEmpty) return null

    // Page objects live OUTSIDE content streams; count on the raw
    // text. "/Type /Page" with arbitrary whitespace, not "/Pages".
    val pages = "/Type\\s*/Page(?![a-zA-Z])".r.findAllIn(raw).size

    val sb = new java.lang.StringBuilder
    var searchFrom = 0
    var guard = 0
    while (guard < (1 << 16)) {
      guard += 1
      val s = raw.indexOf("stream", searchFrom)
      if (s < 0) {
        guard = 1 << 16
      } else {
        // keyword must be followed by EOL per spec (tolerate \n, \r\n)
        var ds = s + "stream".length
        if (ds < raw.length && raw.charAt(ds) == '\r') ds += 1
        if (ds < raw.length && raw.charAt(ds) == '\n') ds += 1
        val e = raw.indexOf("endstream", ds)
        if (e < 0) {
          guard = 1 << 16 // truncated stream: stop, keep what we have
        } else {
          // the governing dict: scan back a bounded window for the
          // filter name (content-stream dicts are tiny)
          val dictFrom = math.max(0, s - 256)
          val dict = raw.substring(dictFrom, s)
          val block = java.util.Arrays.copyOfRange(bytes, ds, e)
          val content =
            if (dict.contains("FlateDecode")) inflate(block)
            else block
          if (content != null) appendStreamText(sb, content)
          searchFrom = e + "endstream".length
        }
      }
    }
    // collapse newline runs, trim
    val text = sb.toString.replaceAll("\n+", "\n")
      .replaceAll("^\n+|\n+$", "")
    Extract(text, pages, version)
  }

  private def inflate(data: Array[Byte]): Array[Byte] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      var n = inf.inflate(buf)
      var guard = 0
      while (n > 0 && guard < (1 << 16)) {
        out.write(buf, 0, n)
        n = inf.inflate(buf)
        guard += 1
      }
      if (!inf.finished()) null else out.toByteArray
    } catch { case _: Exception => null }

  /** One pass over a content stream: literal/hex strings with full
    * escape handling, shown-string operators, line moves. Appends to
    * `sb`, opening with a newline so streams join on line breaks. */
  private def appendStreamText(sb: java.lang.StringBuilder,
                               content: Array[Byte]): Unit = {
    val s = new String(content, "ISO-8859-1")
    val n = s.length
    var i = 0
    sb.append('\n')
    var pendingString: String = null // last parsed string, uncommitted
    def commit(): Unit =
      if (pendingString != null) { sb.append(pendingString); pendingString = null }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '(') {
        commit()
        val (str, next) = parseLiteral(s, i)
        pendingString = str
        i = next
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) != '<') {
        commit()
        val (str, next) = parseHex(s, i)
        pendingString = str
        i = next
      } else if (c == '[') {
        // TJ array: strings inside concatenate; numbers (kerning) skip
        commit()
        val close = matchBracket(s, i)
        val inner = new java.lang.StringBuilder
        var j = i + 1
        while (j < close) {
          val cj = s.charAt(j)
          if (cj == '(') {
            val (str, next) = parseLiteral(s, j); inner.append(str); j = next
          } else if (cj == '<') {
            val (str, next) = parseHex(s, j); inner.append(str); j = next
          } else j += 1
        }
        pendingString = inner.toString
        i = close + 1
      } else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
        // read an operator token
        var j = i
        while (j < n && !s.charAt(j).isWhitespace &&
          "()<>[]/".indexOf(s.charAt(j)) < 0) j += 1
        val op = s.substring(i, j)
        op match {
          case "Tj" | "TJ" => commit()
          case "'" => sb.append('\n'); commit() // next-line-show
          case "\"" => sb.append('\n'); commit() // aw ac variant
          case "Td" | "TD" | "T*" =>
            pendingString = null // positioned args are not text
            sb.append('\n')
          case _ => pendingString = null // any other op discards
        }
        i = if (j > i) j else i + 1
      } else i += 1
    }
  }

  /** Literal string `( … )`: balanced unescaped parens nest; escapes
    * per ISO 32000-1 §7.3.4.2 (\n \r \t \b \f \( \) \\, octal \ddd,
    * backslash-EOL line continuation). Returns (decoded, indexAfter). */
  private[plans] def parseLiteral(s: String, open: Int): (String, Int) = {
    val out = new java.lang.StringBuilder
    var depth = 1
    var i = open + 1
    val n = s.length
    while (i < n && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val e = s.charAt(i + 1)
        e match {
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 't' => out.append('\t'); i += 2
          case 'b' => out.append('\b'); i += 2
          case 'f' => out.append('\f'); i += 2
          case '(' => out.append('('); i += 2
          case ')' => out.append(')'); i += 2
          case '\\' => out.append('\\'); i += 2
          case '\r' => i += 2; if (i < n && s.charAt(i) == '\n') i += 1
          case '\n' => i += 2 // line continuation: nothing emitted
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < n && s.charAt(i) >= '0' &&
              s.charAt(i) <= '7') { v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1 }
            out.append((v & 0xFF).toChar)
          case other => out.append(other); i += 2 // spec: drop backslash
        }
      } else if (c == '(') { depth += 1; out.append(c); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) out.append(c)
        i += 1
      } else { out.append(c); i += 1 }
    }
    (out.toString, i)
  }

  /** Hex string `<48656C6C6F>`: whitespace ignored, odd final digit
    * padded with 0 per spec. */
  private[plans] def parseHex(s: String, open: Int): (String, Int) = {
    val out = new java.lang.StringBuilder
    var i = open + 1
    val n = s.length
    var hi = -1
    while (i < n && s.charAt(i) != '>') {
      val c = s.charAt(i)
      val v = Character.digit(c, 16)
      if (v >= 0) {
        if (hi < 0) hi = v
        else { out.append(((hi << 4) | v).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.append((hi << 4).toChar)
    ((out.toString, math.min(i + 1, n)))
  }

  private def matchBracket(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == ')') inStr = false
      } else c match {
        case '(' => inStr = true
        case '[' => depth += 1
        case ']' =>
          depth -= 1
          if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    s.length - 1
  }

  // ---- muxer (fixtures/tests): genuine, reader-openable bytes ----

  private def escapeLiteral(t: String): String =
    t.flatMap {
      case '\\' => "\\\\"
      case '(' => "\\("
      case ')' => "\\)"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c => c.toString
    }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    out.toByteArray
  }

  /** A genuine multi-page PDF (header, catalog, page tree, Flate
    * content streams, font, xref, trailer — opens in any reader) with
    * one text SHOW per page. */
  def encodePdf(pageTexts: Seq[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def beginObj(id: Int): Unit = { offsets += bos.size(); w(s"$id 0 obj\n") }

    val nPages = pageTexts.size
    val fontId = 3 + 2 * nPages
    w("%PDF-1.4\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until nPages).map(k => s"${3 + 2 * k} 0 R").mkString(" ")
    beginObj(2)
    w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>\nendobj\n")
    pageTexts.zipWithIndex.foreach { case (t, k) =>
      val pageId = 3 + 2 * k
      beginObj(pageId)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents ${pageId + 1} 0 R " +
        s"/Resources << /Font << /F1 $fontId 0 R >> >> >>\nendobj\n")
      val content =
        s"BT /F1 12 Tf 72 720 Td (${escapeLiteral(t)}) Tj ET"
      val z = deflate(content.getBytes("ISO-8859-1"))
      beginObj(pageId + 1)
      w(s"<< /Length ${z.length} /Filter /FlateDecode >>\nstream\n")
      bos.write(z)
      w("\nendstream\nendobj\n")
    }
    beginObj(fontId)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xref = bos.size()
    w(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    bos.toByteArray
  }
}

/** `pdf_text(content)` → struct(text, n_pages, version); null for
  * non-PDF bytes. CodegenFallback: one eval per document. */
case class PdfTextExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pdf_text expects binary, got ${other.simpleString}")
    }

  override def dataType: DataType = PdfTextExpr.Schema
  override def nullable: Boolean = true
  override def prettyName: String = PdfTextExpr.Name

  override protected def nullSafeEval(input: Any): Any = {
    val r = PdfCodec.extract(input.asInstanceOf[Array[Byte]])
    if (r == null) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(r.text), r.pages,
      UTF8String.fromString(r.version)))
  }

  override protected def withNewChildInternal(
      newChild: Expression): PdfTextExpr = copy(child = newChild)
}

object PdfTextExpr {
  val Name = "pdf_text"
  val Schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_pages", IntegerType, nullable = false),
    StructField("version", StringType, nullable = false)))
  private[plans] val info =
    new ExpressionInfo(classOf[PdfTextExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 1,
      s"pdf_text expects 1 argument (content), got ${children.size}")
    PdfTextExpr(children.head)
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** `pdf_synth(text, maxPageChars)` → a genuine PDF whose pages carry
  * `text` split at fixed char boundaries — the fixture generator for
  * the m15 oracle (the png_synth/mov_synth discipline: synthesis
  * distributed, in-plan, deterministic). */
case class PdfSynthExpr(child: Expression, pageChars: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  override def left: Expression = child
  override def right: Expression = pageChars

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, pageChars.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pdf_synth expects (string, int), got $other")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = PdfSynthExpr.Name

  override protected def nullSafeEval(t: Any, pc: Any): Any = {
    val text = t.asInstanceOf[UTF8String].toString
    val per = math.max(1, pc.asInstanceOf[Int])
    val pages =
      if (text.isEmpty) Seq("")
      else text.grouped(per).toSeq
    PdfCodec.encodePdf(pages)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PdfSynthExpr =
    copy(child = newLeft, pageChars = newRight)
}

object PdfSynthExpr {
  val Name = "pdf_synth"
  private[plans] val info =
    new ExpressionInfo(classOf[PdfSynthExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 2,
      s"pdf_synth expects 2 arguments (text, pageChars), got ${children.size}")
    PdfSynthExpr(children(0), children(1))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}
