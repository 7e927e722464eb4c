package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset detection + repair for crawl payloads:
  * `decode_text(bytes)` → struct(text, charset) — the CCNet-style
  * front step BEFORE HTML extraction. Crawl bodies are routinely
  * mislabeled: a server says UTF-8 and sends Latin-1 (or says nothing
  * at all), and a blind UTF-8 decode turns every high byte into
  * U+FFFD — text the funnel then scores and dedups WRONG, silently.
  *
  * Policy (deliberately deterministic, no statistical guessing):
  *  - a UTF-16 BOM (FE FF / FF FE) whose payload is well-formed
  *    UTF-16 (even length, no unpaired surrogates) decodes as
  *    "utf-16be"/"utf-16le" — the legacy-Windows-site crawl class;
  *    a BOM over a MALFORMED stream falls through (reversibility);
  *  - bytes that ARE well-formed UTF-8 (RFC 3629: correct
  *    continuation structure, no overlongs, no surrogates, max
  *    U+10FFFF) decode as UTF-8, charset = "utf-8" (a BOM byte is
  *    never valid UTF-8, so the branches cannot overlap);
  *  - not UTF-8 → the LEGACY CJK probes, in fixed precedence
  *    euc-jp → shift_jis → big5 → gbk (a large share of real crawls;
  *    CCNet's front step handles exactly these). Each probe is
  *    deterministic, no statistical guessing: (1) a byte-SHAPE walk —
  *    the charset's lead/trail zone structure must hold over the whole
  *    body AND a charset-DISTINCTIVE shape must occur (see the probe
  *    scaladocs: EUC-JP needs a kana-row pair, Shift_JIS a 0x81-0x9F
  *    lead pair — a byte zone no EUC/Big5 text contains — Big5 an
  *    ASCII-zone trail no EUC/GB2312 pair has); (2) a strict JDK
  *    decode + re-encode that must return the input bytes exactly, so
  *    the reversibility guarantee extends to every CJK branch.
  *    Precedence resolves the genuinely byte-ambiguous residue
  *    (GB2312-zone pairs are structurally valid Big5; kana rows
  *    coincide between JIS and GB2312 by ISO-2022 heritage) toward
  *    the crawl-frequent reading — a deployment wanting
  *    language-model disambiguation hangs it behind the same seam;
  *  - anything else decodes as ISO-8859-1, charset = "iso-8859-1" —
  *    the fallback that never loses bytes (every byte maps to exactly
  *    one code point, reversibly), which is why it is THE standard
  *    crawl fallback: wrong-but-recoverable beats U+FFFD holes.
  *  - null input → null struct; empty → ("", "utf-8").
  * Every branch is byte-reversible: text re-encoded in the reported
  * charset (BOM restored for the utf-16 pair) returns the input.
  *
  * ASCII-only bodies are valid UTF-8 and take the first branch — the
  * common case costs one linear scan with no allocation beyond the
  * output string; the CJK probes run only on high-byte non-UTF-8
  * bodies, and the shape walks fail fast before any JDK decode.
  */
case class TextDecodeExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"decode_text expects binary, got ${other.simpleString}")
    }

  override def dataType: DataType = TextDecodeExpr.Schema
  override def nullable: Boolean = true
  override def prettyName: String = TextDecodeExpr.Name

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val (text, cs) = TextDecodeExpr.decode(bytes)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(text), UTF8String.fromString(cs)))
  }

  override protected def withNewChildInternal(
      newChild: Expression): TextDecodeExpr = copy(child = newChild)
}

object TextDecodeExpr {
  val Name = "decode_text"
  val Schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("charset", StringType, nullable = false)))

  /** Strict RFC 3629 well-formedness: continuation structure,
    * overlong rejection, surrogate rejection, ≤ U+10FFFF. */
  private[plans] def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c < 0xC2) return false // continuation or overlong lead
      else if (c < 0xE0) { // 2 bytes
        if (i + 1 >= n || (b(i + 1) & 0xC0) != 0x80) return false
        i += 2
      } else if (c < 0xF0) { // 3 bytes
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xFF
        // E0: c1 >= A0 (no overlong); ED: c1 <= 9F (no surrogates)
        val lo = if (c == 0xE0) 0xA0 else 0x80
        val hi = if (c == 0xED) 0x9F else 0xBF
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xC0) != 0x80) return false
        i += 3
      } else if (c < 0xF5) { // 4 bytes
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xFF
        // F0: c1 >= 90 (no overlong); F4: c1 <= 8F (≤ U+10FFFF)
        val lo = if (c == 0xF0) 0x90 else 0x80
        val hi = if (c == 0xF4) 0x8F else 0xBF
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xC0) != 0x80 ||
          (b(i + 3) & 0xC0) != 0x80) return false
        i += 4
      } else return false // F5-FF never valid
    }
    true
  }

  /** BOM-marked UTF-16 (the legacy-Windows-site crawl class): taken
    * only when the payload is WELL-FORMED UTF-16 after the BOM (even
    * byte count, no unpaired surrogates) — a malformed stream falls
    * through to the UTF-8/Latin-1 logic so the byte-reversibility
    * guarantee (re-encoding the text in the reported charset, BOM
    * restored, returns the exact input) holds on every branch. */
  private[plans] def validUtf16(b: Array[Byte], be: Boolean): Boolean = {
    if ((b.length - 2) % 2 != 0) return false
    var i = 2
    var expectLow = false
    while (i + 1 < b.length) {
      val u =
        if (be) ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
        else ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)
      if (expectLow) {
        if (u < 0xDC00 || u > 0xDFFF) return false
        expectLow = false
      } else if (u >= 0xD800 && u <= 0xDBFF) expectLow = true
      else if (u >= 0xDC00 && u <= 0xDFFF) return false
      i += 2
    }
    !expectLow
  }

  def decode(bytes: Array[Byte]): (String, String) =
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte &&
      bytes(1) == 0xFF.toByte && validUtf16(bytes, be = true))
      (new String(bytes, 2, bytes.length - 2,
        StandardCharsets.UTF_16BE), "utf-16be")
    else if (bytes.length >= 2 && bytes(0) == 0xFF.toByte &&
      bytes(1) == 0xFE.toByte && validUtf16(bytes, be = false))
      (new String(bytes, 2, bytes.length - 2,
        StandardCharsets.UTF_16LE), "utf-16le")
    else if (isValidUtf8(bytes))
      (new String(bytes, StandardCharsets.UTF_8), "utf-8")
    else decodeCjk(bytes).getOrElse(
      (new String(bytes, StandardCharsets.ISO_8859_1), "iso-8859-1"))

  // ---- legacy CJK codepages (GBK / Shift_JIS / EUC-JP / Big5) ----

  /** EUC-JP shape walk: ASCII, 0x8E+[A1-DF] (half-width katakana),
    * 0x8F+[A1-FE][A1-FE] (JIS X 0212 plane), or [A1-FE][A1-FE] pairs.
    * The DISTINCTIVE signal is a kana-row pair (lead 0xA4/0xA5) or a
    * 0x8E marker: real Japanese prose always carries kana, while
    * Chinese GB2312-zone text (whose pairs are byte-identical EUC
    * structure) essentially never hits those rows — the deterministic
    * stand-in for a language model. Returns None when the shape
    * breaks, Some(signal) otherwise. */
  private[plans] def eucJpShape(b: Array[Byte]): Option[Boolean] = {
    var i = 0
    val n = b.length
    var signal = false
    var units = 0
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c == 0x8E) {
        if (i + 1 >= n) return None
        val t = b(i + 1) & 0xFF
        if (t < 0xA1 || t > 0xDF) return None
        signal = true; units += 1; i += 2
      } else if (c == 0x8F) {
        if (i + 2 >= n) return None
        val t1 = b(i + 1) & 0xFF; val t2 = b(i + 2) & 0xFF
        if (t1 < 0xA1 || t1 > 0xFE || t2 < 0xA1 || t2 > 0xFE) return None
        units += 1; i += 3
      } else if (c >= 0xA1 && c <= 0xFE) {
        if (i + 1 >= n) return None
        val t = b(i + 1) & 0xFF
        if (t < 0xA1 || t > 0xFE) return None
        if (c == 0xA4 || c == 0xA5) signal = true
        units += 1; i += 2
      } else return None
    }
    Some(signal && units >= MinCjkUnits)
  }

  /** Shift_JIS shape walk: ASCII, single-byte katakana [A1-DF], or
    * 2-byte [81-9F|E0-FC][40-7E|80-FC]. The DISTINCTIVE signal is a
    * 2-byte pair whose lead is ≤ 0x9F — a byte no EUC-JP or Big5 body
    * ever contains (their leads/trails all sit ≥ 0xA1 or ≤ 0x7E), and
    * the zone Shift_JIS kana/level-1 kanji live in. (A GBK body built
    * PURELY of 0x81-0x9F-lead extension-zone pairs would alias; those
    * rows are rare-hanzi territory that never makes up whole pages.) */
  private[plans] def sjisShape(b: Array[Byte]): Option[Boolean] = {
    var i = 0
    val n = b.length
    var signal = false
    var units = 0
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c >= 0xA1 && c <= 0xDF) i += 1
      else if ((c >= 0x81 && c <= 0x9F) || (c >= 0xE0 && c <= 0xFC)) {
        if (i + 1 >= n) return None
        val t = b(i + 1) & 0xFF
        if (t < 0x40 || t > 0xFC || t == 0x7F) return None
        if (c <= 0x9F) signal = true
        units += 1; i += 2
      } else return None
    }
    Some(signal && units >= MinCjkUnits)
  }

  /** Big5 shape walk: ASCII or [A1-F9][40-7E|A1-FE]. The DISTINCTIVE
    * signal is an ASCII-zone trail (0x40-0x7E) — no EUC pair and no
    * GB2312-zone pair has one, and real Big5 prose hits them
    * constantly (是 = 0xAC4F). A GB2312-zone GBK body (trails all
    * ≥ 0xA1) is structurally valid Big5 but never signals, which is
    * what routes it onward to the GBK probe. */
  private[plans] def big5Shape(b: Array[Byte]): Option[Boolean] = {
    var i = 0
    val n = b.length
    var signal = false
    var units = 0
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c >= 0xA1 && c <= 0xF9) {
        if (i + 1 >= n) return None
        val t = b(i + 1) & 0xFF
        if (!((t >= 0x40 && t <= 0x7E) || (t >= 0xA1 && t <= 0xFE)))
          return None
        if (t <= 0x7E) signal = true
        units += 1; i += 2
      } else return None
    }
    Some(signal && units >= MinCjkUnits)
  }

  /** GBK shape walk: ASCII or [81-FE][40-FE except 7F] — the broadest
    * of the four zones (why it probes LAST); the signal is simply ≥ 1
    * pair. */
  private[plans] def gbkShape(b: Array[Byte]): Option[Boolean] = {
    var i = 0
    val n = b.length
    var pairs = 0
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c >= 0x81 && c <= 0xFE) {
        if (i + 1 >= n) return None
        val t = b(i + 1) & 0xFF
        if (t < 0x40 || t > 0xFE || t == 0x7F) return None
        pairs += 1; i += 2
      } else return None
    }
    Some(pairs >= MinCjkUnits)
  }

  /** Evidence floor for any CJK claim: at least THREE multi-byte
    * units. One high-byte pair is what Latin-1 prose produces at an
    * accented letter followed by another letter ("idée" → E9 65, a
    * valid GBK AND Big5 pair), and two pairs is what four adjacent
    * non-CJK high bytes produce (an overlong UTF-8 quad is two valid
    * GBK pairs) — neither is evidence of a codepage, while any real
    * CJK body carries far more than three characters. */
  private[plans] val MinCjkUnits = 3

  /** The probe ladder. Each candidate that shape-matches WITH its
    * distinctive signal must additionally survive a strict JDK decode
    * (malformed/unmappable = REPORT) AND re-encode byte-identically —
    * duplicate-mapping corners in these codepages would otherwise
    * break the operator's reversibility contract. */
  private def decodeCjk(bytes: Array[Byte]): Option[(String, String)] = {
    def probe(shape: Option[Boolean], csName: String,
              label: String): Option[(String, String)] =
      shape.filter(identity).flatMap { _ =>
        if (!java.nio.charset.Charset.isSupported(csName)) None
        else try {
          val cs = java.nio.charset.Charset.forName(csName)
          val dec = cs.newDecoder()
            .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
            .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
          val text = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
          val enc = cs.newEncoder()
            .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
            .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
          val back = enc.encode(java.nio.CharBuffer.wrap(text))
          val rt = new Array[Byte](back.remaining())
          back.get(rt)
          if (java.util.Arrays.equals(rt, bytes)) Some((text, label))
          else None
        } catch {
          case _: java.nio.charset.CharacterCodingException => None
        }
      }
    probe(eucJpShape(bytes), "EUC-JP", "euc-jp")
      .orElse(probe(sjisShape(bytes), "Shift_JIS", "shift_jis"))
      .orElse(probe(big5Shape(bytes), "Big5", "big5"))
      .orElse(probe(gbkShape(bytes), "GBK", "gbk"))
  }

  private[plans] val info =
    new ExpressionInfo(classOf[TextDecodeExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 1,
      s"decode_text expects 1 argument (bytes), got ${children.size}")
    TextDecodeExpr(children.head)
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}
