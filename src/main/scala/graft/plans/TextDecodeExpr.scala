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
  * output string. A statistical detector (chardet-style) can sit
  * behind the same struct contract if a deployment needs legacy CJK
  * codepages; the two-branch core is what the oracle can pin exactly.
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
    else
      (new String(bytes, StandardCharsets.ISO_8859_1), "iso-8859-1")

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
