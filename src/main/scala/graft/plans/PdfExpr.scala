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
  * SCOPE, stated truthfully: Flate-or-raw content streams, the
  * string/positioning operators (`Tj`, `'`, `"`, `TJ` arrays, literal
  * strings with escapes/nesting/octal, hex strings, `Td`/`TD`/`T*`
  * line moves), AND Type0/Identity-H composite fonts whose /ToUnicode
  * CMap ships bfchar/bfrange mappings — the form every modern PDF
  * generator emits (word processors, browsers, LaTeX with CID
  * output). Font switches (`/Fx … Tf`) select the decode mode
  * per-string: a font with a parsed ToUnicode map reads shown strings
  * as 2-byte big-endian codes through the map (unmapped codes drop);
  * any other font keeps the 1-byte StandardEncoding read. Font
  * resource NAMES are resolved file-globally, first binding wins — a
  * PDF reusing one name for different fonts across pages resolves to
  * the first (generators emit globally unique names; a per-page
  * resource walk is the full-renderer seam). Encrypted PDFs,
  * ToUnicode-less CID fonts, and non-Flate filters (DCT, LZW, …)
  * yield null/empty like the H.264 seam: a deployment adds a full
  * renderer behind the same struct contract.
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

  // Hot-path patterns compiled ONCE (extract runs per document; a
  // literal "…".r inside it recompiles the Pattern per row — measured
  // as a visible slice of the m15/m16 per-doc budget at 320 K docs).
  private val PageRe = "/Type\\s*/Page(?![a-zA-Z])".r
  private val ObjRe = "(?m)(\\d+)\\s+0\\s+obj".r
  private val Type0Re = "/Subtype\\s*/Type0".r
  private val ToUnicodeRe = "/ToUnicode\\s+(\\d+)\\s+0\\s+R".r
  private val FontDictRe = "(?s)/Font\\s*<<(.*?)>>".r
  private val FontBindRe = "/([A-Za-z0-9_.]+)\\s+(\\d+)\\s+0\\s+R".r
  private val CmapTokRe = "<([0-9A-Fa-f\\s]*)>|\\[|\\]|[A-Za-z]+".r

  private val HexUpper = "0123456789ABCDEF"

  /** Zero-padded 10-digit decimal — the xref entry form, without a
    * java.util.Formatter per object. */
  private def dec10(v: Int): String = {
    val s = java.lang.Integer.toString(v)
    "0000000000".substring(s.length) + s
  }

  /** Fixed-width uppercase hex — the `f"$v%04X"` equivalent without a
    * java.util.Formatter per call (the CID synth shows one hex code
    * per CHARACTER of page text). */
  private def hex4(v: Int): String = {
    val a = new Array[Char](4)
    a(0) = HexUpper.charAt((v >>> 12) & 0xF)
    a(1) = HexUpper.charAt((v >>> 8) & 0xF)
    a(2) = HexUpper.charAt((v >>> 4) & 0xF)
    a(3) = HexUpper.charAt(v & 0xF)
    new String(a)
  }

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
    val pages = PageRe.findAllIn(raw).size

    // Type0 fonts: resource name → ToUnicode code map (empty for
    // simple-font PDFs; total — a malformed font graph just yields no
    // CID decoding, never a throw).
    val fontCmaps =
      try collectCidFonts(raw, bytes)
      catch { case _: Exception => Map.empty[String, Map[Int, String]] }

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
          // CMap streams (the ToUnicode objects the font pass reads)
          // are PostScript-ish data, not page content — their hex
          // strings would leak into the text.
          if (content != null &&
            new String(content, "ISO-8859-1").indexOf("begincmap") < 0)
            appendStreamText(sb, content, fontCmaps)
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

  // ---- Type0/Identity-H fonts (ToUnicode CMaps) ----

  /** The font graph of a CID PDF, walked from the raw text: every
    * `/Font << /Name N 0 R … >>` resource binding, each referenced
    * object checked for `/Subtype /Type0` + `/ToUnicode M 0 R`, and
    * object M's stream (Flate or raw) parsed as a ToUnicode CMap.
    * Names bind file-globally, FIRST wins (see the scope note). */
  private[plans] def collectCidFonts(raw: String, bytes: Array[Byte])
      : Map[String, Map[Int, String]] = {
    // Simple-font fast path: a Type0 font dict literally contains
    // "/Type0", so its absence proves there is no CID font to walk —
    // the object-table scan below never pays off on the (majority)
    // simple-font documents.
    if (raw.indexOf("/Type0") < 0) return Map.empty
    // object id → (body text, stream byte range) for the tiny object
    // set a font graph touches.
    val objs = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    ObjRe.findAllMatchIn(raw).take(1 << 14).foreach { m =>
      val id = m.group(1).toInt
      val end = raw.indexOf("endobj", m.end)
      if (end > 0 && !objs.contains(id)) objs(id) = (m.end, end)
    }
    def objBody(id: Int): Option[String] =
      objs.get(id).map { case (a, b) => raw.substring(a, b) }
    def objStream(id: Int): Option[Array[Byte]] =
      objs.get(id).flatMap { case (a, b) =>
        val s = raw.indexOf("stream", a)
        if (s < 0 || s >= b) None
        else {
          var ds = s + "stream".length
          if (ds < raw.length && raw.charAt(ds) == '\r') ds += 1
          if (ds < raw.length && raw.charAt(ds) == '\n') ds += 1
          val e = raw.indexOf("endstream", ds)
          if (e < 0) None
          else {
            val block = java.util.Arrays.copyOfRange(bytes, ds, e)
            if (raw.substring(a, s).contains("FlateDecode"))
              Option(inflate(block))
            else Some(block)
          }
        }
      }
    val cmapOfFont = scala.collection.mutable.Map.empty[Int, Map[Int, String]]
    def fontCmap(fontId: Int): Option[Map[Int, String]] =
      cmapOfFont.get(fontId).filter(_.nonEmpty).orElse {
        val m = (for {
          body <- objBody(fontId)
          if Type0Re.findFirstIn(body).isDefined
          tu <- ToUnicodeRe.findFirstMatchIn(body)
          stream <- objStream(tu.group(1).toInt)
        } yield parseToUnicode(stream)).getOrElse(Map.empty)
        cmapOfFont(fontId) = m
        if (m.isEmpty) None else Some(m)
      }
    val out = scala.collection.mutable.Map.empty[String, Map[Int, String]]
    FontDictRe.findAllMatchIn(raw).take(1 << 12).foreach { fm =>
      FontBindRe
        .findAllMatchIn(fm.group(1)).foreach { b =>
          val name = b.group(1)
          if (!out.contains(name))
            fontCmap(b.group(2).toInt).foreach(out(name) = _)
        }
    }
    out.toMap
  }

  /** ToUnicode CMap (ISO 32000-1 §9.10.3 / Adobe CMap spec): bfchar
    * pairs `<src> <dst>`, bfrange triples `<lo> <hi> <dst>` (dst's
    * final UTF-16 unit increments across the range) or
    * `<lo> <hi> [<d0> <d1> …]` (array form). Src codes read as
    * big-endian ints (Identity-H = 2 bytes); dst hex is UTF-16BE,
    * possibly multi-unit (ligatures). Total: junk tokens skip, the
    * map is capped at the 16-bit code space. */
  private[graft] def parseToUnicode(cmap: Array[Byte]): Map[Int, String] = {
    val s = new String(cmap, "ISO-8859-1")
    // Token stream: hex strings, brackets, bare words.
    val toks = CmapTokRe.findAllMatchIn(s).take(1 << 18).map { m =>
      if (m.matched == "[") ("[", null)
      else if (m.matched == "]") ("]", null)
      else if (m.matched.startsWith("<"))
        ("hex", m.group(1).replaceAll("\\s", ""))
      else (m.matched, null)
    }.toVector
    def hexBytes(h: String): Array[Byte] = {
      val padded = if (h.length % 2 == 1) h + "0" else h
      padded.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }
    def hexInt(h: String): Int =
      // low 16 bits == the last four hex digits; Integer.parseInt on a
      // ≤4-char slice replaces a BigInt allocation per mapping entry.
      if (h.isEmpty) 0 else Integer.parseInt(h.takeRight(4), 16)
    def utf16(h: String): String =
      new String(hexBytes(h), java.nio.charset.StandardCharsets.UTF_16BE)
    val out = scala.collection.mutable.Map.empty[Int, String]
    var i = 0
    while (i < toks.length) {
      toks(i)._1 match {
        case "beginbfchar" =>
          i += 1
          while (i + 1 < toks.length && toks(i)._1 == "hex" &&
            toks(i + 1)._1 == "hex") {
            if (out.size < (1 << 16))
              out(hexInt(toks(i)._2)) = utf16(toks(i + 1)._2)
            i += 2
          }
        case "beginbfrange" =>
          i += 1
          var more = true
          while (more && i + 2 < toks.length && toks(i)._1 == "hex" &&
            toks(i + 1)._1 == "hex") {
            val lo = hexInt(toks(i)._2)
            val hi = hexInt(toks(i + 1)._2)
            if (toks(i + 2)._1 == "hex") {
              val base = utf16(toks(i + 2)._2)
              if (base.nonEmpty && hi >= lo && hi - lo < (1 << 16)) {
                var c = lo
                while (c <= hi && out.size < (1 << 16)) {
                  val bumped = base.dropRight(1) +
                    (base.last + (c - lo)).toChar
                  out(c) = bumped
                  c += 1
                }
              }
              i += 3
            } else if (toks(i + 2)._1 == "[") {
              var j = i + 3
              var c = lo
              while (j < toks.length && toks(j)._1 == "hex") {
                if (c <= hi && out.size < (1 << 16)) out(c) = utf16(toks(j)._2)
                c += 1; j += 1
              }
              i = if (j < toks.length && toks(j)._1 == "]") j + 1 else j
            } else more = false
          }
        case _ => i += 1
      }
    }
    out.toMap
  }

  /** Map a captured string's raw bytes through a CID font's ToUnicode
    * table: 2-byte big-endian codes, unmapped codes drop, a dangling
    * odd byte drops. */
  private def decodeCid(raw: String, cmap: Map[Int, String]): String = {
    val sb = new java.lang.StringBuilder(raw.length / 2)
    var i = 0
    while (i + 1 < raw.length) {
      val code = ((raw.charAt(i) & 0xFF) << 8) | (raw.charAt(i + 1) & 0xFF)
      cmap.get(code).foreach(sb.append)
      i += 2
    }
    sb.toString
  }

  /** One pass over a content stream: literal/hex strings with full
    * escape handling, shown-string operators, line moves, and `Tf`
    * font switches (a CID font's strings decode through its ToUnicode
    * map AT CAPTURE — `fontCmaps` is empty for simple-font PDFs and
    * the walk is byte-identical to the pre-CID form). Appends to
    * `sb`, opening with a newline so streams join on line breaks. */
  private def appendStreamText(sb: java.lang.StringBuilder,
                               content: Array[Byte],
                               fontCmaps: Map[String, Map[Int, String]])
      : Unit = {
    val s = new String(content, "ISO-8859-1")
    val n = s.length
    var i = 0
    sb.append('\n')
    var pendingString: String = null // last parsed string, uncommitted
    var lastName: String = null // last /Name token (the Tf operand)
    var cmap: Map[Int, String] = null // current font's CID map, if any
    def captured(rawStr: String): String =
      if (cmap == null) rawStr else decodeCid(rawStr, cmap)
    def commit(): Unit =
      if (pendingString != null) { sb.append(pendingString); pendingString = null }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '(') {
        commit()
        val (str, next) = parseLiteral(s, i)
        pendingString = captured(str)
        i = next
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) != '<') {
        commit()
        val (str, next) = parseHex(s, i)
        pendingString = captured(str)
        i = next
      } else if (c == '[') {
        // TJ array: strings inside concatenate; numbers (kerning)
        // skip. CID decode applies per element (codes never span
        // kerning breaks).
        commit()
        val close = matchBracket(s, i)
        val inner = new java.lang.StringBuilder
        var j = i + 1
        while (j < close) {
          val cj = s.charAt(j)
          if (cj == '(') {
            val (str, next) = parseLiteral(s, j)
            inner.append(captured(str)); j = next
          } else if (cj == '<') {
            val (str, next) = parseHex(s, j)
            inner.append(captured(str)); j = next
          } else j += 1
        }
        pendingString = inner.toString
        i = close + 1
      } else if (c == '/') {
        // name token (candidate Tf operand)
        var j = i + 1
        while (j < n && !s.charAt(j).isWhitespace &&
          "()<>[]/".indexOf(s.charAt(j)) < 0) j += 1
        lastName = s.substring(i + 1, j)
        pendingString = null
        i = j
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
          case "Tf" =>
            pendingString = null
            cmap = if (lastName == null) null
              else fontCmaps.get(lastName).orNull
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

  private def escapeLiteral(t: String): String = {
    // Char-loop, not flatMap: the flatMap form allocates a one-char
    // String per UNESCAPED character, and this runs per page of every
    // synthesized PDF.
    val sb = new java.lang.StringBuilder(t.length + 8)
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      c match {
        case '\\' => sb.append("\\\\")
        case '(' => sb.append("\\(")
        case ')' => sb.append("\\)")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    out.toByteArray
  }

  /** A genuine multi-page CID PDF (Type0 font, /Encoding /Identity-H,
    * CIDFontType2 descendant, Flate /ToUnicode CMap, hex-string shows
    * of 2-byte codes) — the modern-generator shape [[extract]]'s CMap
    * path decodes. Codes are 0x0100 + the char's rank in the sorted
    * distinct UTF-16-unit set (deliberately NOT the identity mapping,
    * so extraction succeeds only by actually reading the CMap); the
    * first half of the units ships as bfchar entries, the rest as
    * increment-form bfrange runs over consecutive unit values — both
    * grammar forms exercised by every fixture. No embedded glyph
    * program (readers open the file; rendering shows blanks — the
    * fixture contract is the byte structure, not typography). Null
    * for > 0xFE00 distinct units (the 16-bit code space less the
    * offset). */
  def encodePdfCid(pageTexts: Seq[String]): Array[Byte] = {
    val units = pageTexts.flatMap(_.toCharArray).distinct.sorted
    if (units.length > 0xFE00) return null
    val code = units.zipWithIndex
      .map { case (u, r) => u -> (0x0100 + r) }.toMap
    // Per-character hex is the synth's hottest loop (one 4-digit code
    // per character of page text): precompute each unit's hex string
    // once instead of running a Formatter per character.
    val codeHex: java.util.HashMap[Character, String] = {
      val m = new java.util.HashMap[Character, String](units.length * 2)
      code.foreach { case (u, c) => m.put(u, hex4(c)) }
      m
    }

    // ---- the ToUnicode CMap ----
    val cm = new StringBuilder
    cm.append("/CIDInit /ProcSet findresource begin\n")
    cm.append("12 dict begin\nbegincmap\n")
    cm.append("/CMapName /GraftToUnicode def\n/CMapType 2 def\n")
    cm.append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
    val half = units.length / 2
    units.take(half).grouped(100).foreach { chunk =>
      cm.append(s"${chunk.length} beginbfchar\n")
      chunk.foreach(u =>
        cm.append("<").append(hex4(code(u))).append("> <")
          .append(hex4(u.toInt)).append(">\n"))
      cm.append("endbfchar\n")
    }
    // Maximal consecutive-value runs over the tail (codes are already
    // consecutive by construction — rank order).
    val rest = units.drop(half)
    if (rest.nonEmpty) {
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Char, Char)]
      var start = rest.head
      var prev = rest.head
      rest.tail.foreach { u =>
        if (u != prev + 1) { runs += ((start, prev)); start = u }
        prev = u
      }
      runs += ((start, prev))
      runs.grouped(100).foreach { chunk =>
        cm.append(s"${chunk.length} beginbfrange\n")
        chunk.foreach { case (a, b) =>
          cm.append("<").append(hex4(code(a))).append("> <")
            .append(hex4(code(b))).append("> <")
            .append(hex4(a.toInt)).append(">\n")
        }
        cm.append("endbfrange\n")
      }
    }
    cm.append("endcmap\nCMapName currentdict /CMap defineresource pop\n")
    cm.append("end end\n")
    val cmapZ = deflate(cm.toString.getBytes("ISO-8859-1"))

    // ---- the document ----
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def beginObj(id: Int): Unit = { offsets += bos.size(); w(s"$id 0 obj\n") }
    val nPages = pageTexts.size
    val fontId = 3 + 2 * nPages
    val descId = fontId + 1
    val tuId = fontId + 2
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
      val hexB = new java.lang.StringBuilder(t.length * 4)
      var ci = 0
      while (ci < t.length) { hexB.append(codeHex.get(t.charAt(ci))); ci += 1 }
      val content = s"BT /F1 12 Tf 72 720 Td <$hexB> Tj ET"
      val z = deflate(content.getBytes("ISO-8859-1"))
      beginObj(pageId + 1)
      w(s"<< /Length ${z.length} /Filter /FlateDecode >>\nstream\n")
      bos.write(z)
      w("\nendstream\nendobj\n")
    }
    beginObj(fontId)
    w(s"<< /Type /Font /Subtype /Type0 /BaseFont /GraftCID " +
      s"/Encoding /Identity-H /DescendantFonts [$descId 0 R] " +
      s"/ToUnicode $tuId 0 R >>\nendobj\n")
    beginObj(descId)
    w("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftCID " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) " +
      "/Supplement 0 >> /DW 500 >>\nendobj\n")
    beginObj(tuId)
    w(s"<< /Length ${cmapZ.length} /Filter /FlateDecode >>\nstream\n")
    bos.write(cmapZ)
    w("\nendstream\nendobj\n")
    val xref = bos.size()
    w(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(dec10(o) + " 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    bos.toByteArray
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
    offsets.foreach(o => w(dec10(o) + " 00000 n \n"))
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
  * distributed, in-plan, deterministic).
  *
  * SCOPE: Latin-1 text only, ENFORCED — simple-font literal strings
  * encode one byte per char, so a char > U+00FF cannot ride this
  * container; the expression returns null for such text (mirroring
  * pdf_text's stated CID scope) instead of silently mangling it to
  * '?'. CJK/astral text belongs to [[PdfSynthCidExpr]]. */
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
    if (text.exists(_ > 0xFF)) return null // Latin-1-only contract
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

/** `pdf_synth_cid(text, maxPageChars)` → a genuine Type0/Identity-H
  * PDF ([[PdfCodec.encodePdfCid]]) whose pages carry `text` split at
  * fixed UTF-16-unit boundaries — the m16 fixture generator, carrying
  * the full BMP (and astral text as surrogate-unit pairs) where
  * pdf_synth's simple-font container caps at Latin-1. */
case class PdfSynthCidExpr(child: Expression, pageChars: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  override def left: Expression = child
  override def right: Expression = pageChars

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, pageChars.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pdf_synth_cid expects (string, int), got $other")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = PdfSynthCidExpr.Name

  override protected def nullSafeEval(t: Any, pc: Any): Any = {
    val text = t.asInstanceOf[UTF8String].toString
    val per = math.max(1, pc.asInstanceOf[Int])
    val pages =
      if (text.isEmpty) Seq("")
      else text.grouped(per).toSeq
    PdfCodec.encodePdfCid(pages)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PdfSynthCidExpr =
    copy(child = newLeft, pageChars = newRight)
}

object PdfSynthCidExpr {
  val Name = "pdf_synth_cid"
  private[plans] val info =
    new ExpressionInfo(classOf[PdfSynthCidExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 2,
      s"pdf_synth_cid expects 2 arguments (text, pageChars), got ${children.size}")
    PdfSynthCidExpr(children(0), children(1))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}
