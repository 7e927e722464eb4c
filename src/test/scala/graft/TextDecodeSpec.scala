package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TextDecodeExpr

/** Charset detection/repair contract (plans/TextDecodeExpr): strict
  * RFC 3629 well-formedness drives the branch, ISO-8859-1 is the
  * never-lossy fallback. The cross-engine truth is t18's oracle; this
  * is the local truth for the malformation classes the fixture can't
  * carry (overlongs, surrogates, out-of-range, truncation). */
class TextDecodeSpec extends AnyFunSuite {

  private def d(bytes: Int*): (String, String) =
    TextDecodeExpr.decode(bytes.map(_.toByte).toArray)

  test("well-formed UTF-8 decodes as UTF-8") {
    assert(d() == ("", "utf-8"))
    assert(d(0x61, 0x62) == ("ab", "utf-8"))
    assert(d(0xC3, 0xA9) == ("é", "utf-8")) // 2-byte
    assert(d(0xE2, 0x82, 0xAC) == ("€", "utf-8")) // 3-byte
    assert(d(0xF0, 0x9F, 0x98, 0x80)._2 == "utf-8") // 4-byte emoji
    assert(d(0xED, 0x9F, 0xBF)._2 == "utf-8") // U+D7FF, just below surrogates
    assert(d(0xF4, 0x8F, 0xBF, 0xBF)._2 == "utf-8") // U+10FFFF, the max
  }

  test("malformed UTF-8 falls back to ISO-8859-1 (never lossy)") {
    // Bare high byte (the classic mislabeled-Latin-1 page).
    assert(d(0x63, 0x61, 0x66, 0xE9) == ("café", "iso-8859-1"))
    // Overlong encodings are rejected even though structurally paired.
    assert(d(0xC0, 0x80)._2 == "iso-8859-1") // overlong NUL
    assert(d(0xE0, 0x9F, 0xBF)._2 == "iso-8859-1") // overlong 3-byte
    assert(d(0xF0, 0x8F, 0xBF, 0xBF)._2 == "iso-8859-1") // overlong 4-byte
    // Surrogate range and beyond-U+10FFFF.
    assert(d(0xED, 0xA0, 0x80)._2 == "iso-8859-1") // U+D800
    assert(d(0xF4, 0x90, 0x80, 0x80)._2 == "iso-8859-1") // U+110000
    assert(d(0xF5, 0x80, 0x80, 0x80)._2 == "iso-8859-1") // F5 lead
    // Truncated sequences at EOF.
    assert(d(0x61, 0xC3)._2 == "iso-8859-1")
    assert(d(0xE2, 0x82)._2 == "iso-8859-1")
    // Bare continuation byte.
    assert(d(0x80)._2 == "iso-8859-1")
  }

  test("BOM-marked well-formed UTF-16 decodes; malformed falls through") {
    val be = "x café".getBytes("UTF-16") // Java UTF-16 = BE BOM
    assert(TextDecodeExpr.decode(be) == ("x café", "utf-16be"))
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++
      "hi é".getBytes("UTF-16LE")
    assert(TextDecodeExpr.decode(le) == ("hi é", "utf-16le"))
    // odd byte count after the BOM: not UTF-16, falls through
    assert(TextDecodeExpr.decode(be.dropRight(1))._2 == "iso-8859-1")
    // unpaired surrogate: not well-formed, falls through
    val lone = Array[Byte](0xFE.toByte, 0xFF.toByte,
      0xD8.toByte, 0x00.toByte, 0x00.toByte, 0x41.toByte)
    assert(TextDecodeExpr.decode(lone)._2 == "iso-8859-1")
    // a bare BOM is an empty utf-16 document
    assert(TextDecodeExpr.decode(Array(0xFE.toByte, 0xFF.toByte)) ==
      ("", "utf-16be"))
  }

  test("legacy CJK codepages route by shape + signal, not guessing") {
    val jp = "ascii prefix 日本語テキスト tail"
    val trad = "ascii prefix 這是中文資料 tail"
    val simp = "ascii prefix 中文数据处理 tail"
    def dec(s: String, cs: String) = TextDecodeExpr.decode(s.getBytes(cs))
    assert(dec(jp, "Shift_JIS") == ((jp, "shift_jis")))
    assert(dec(jp, "EUC-JP") == ((jp, "euc-jp")))
    assert(dec(trad, "Big5") == ((trad, "big5")))
    assert(dec(simp, "GBK") == ((simp, "gbk")))
    // The same CJK text properly shipped as UTF-8 stays utf-8.
    assert(dec(simp, "UTF-8") == ((simp, "utf-8")))
    // Documented precedence corners: pure-kana bytes are IDENTICAL in
    // EUC-JP and GB2312 (ISO-2022 heritage) — euc-jp wins by order;
    // half-width katakana (the 0x8E plane) is EUC-JP's own signal.
    assert(dec("こんにちは", "EUC-JP")._2 == "euc-jp")
    assert(dec("ｶﾀｶﾅ", "EUC-JP")._2 == "euc-jp")
    // A Latin-1 page with stray high bytes must NOT be claimed by any
    // CJK probe (unpaired high byte breaks every shape walk).
    assert(TextDecodeExpr.decode(
      Array[Byte]('a', 0xE9.toByte, 'b')) == (("aéb", "iso-8859-1")))
    // GB2312-zone pairs are structurally valid Big5/EUC but carry
    // neither the kana signal nor a low trail — GBK claims them.
    assert(dec("汉字内容", "GBK")._2 == "gbk")
  }

  test("decode is byte-reversible through the reported charset") {
    // The property that makes the fallback SAFE: whatever branch
    // fires, re-encoding the text in the reported charset (BOM
    // restored for the utf-16 pair) returns the exact input bytes —
    // nothing is ever lost, only relabeled.
    def roundTrip(bytes: Array[Byte]): Unit = {
      val (text, cs) = TextDecodeExpr.decode(bytes)
      val back = cs match {
        case "utf-16be" =>
          Array(0xFE.toByte, 0xFF.toByte) ++ text.getBytes("UTF-16BE")
        case "utf-16le" =>
          Array(0xFF.toByte, 0xFE.toByte) ++ text.getBytes("UTF-16LE")
        case _ => text.getBytes(cs)
      }
      assert(java.util.Arrays.equals(back, bytes),
        bytes.map(b => f"${b & 0xFF}%02x").mkString(" "))
    }
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      roundTrip(Array.fill(rnd.nextInt(40))(rnd.nextInt(256).toByte))
    }
    // And adversarially BOM-led random payloads (the utf-16 branches'
    // own fall-through classes).
    (0 until 2000).foreach { _ =>
      val bom = if (rnd.nextBoolean()) Array(0xFE.toByte, 0xFF.toByte)
        else Array(0xFF.toByte, 0xFE.toByte)
      roundTrip(bom ++ Array.fill(rnd.nextInt(20))(rnd.nextInt(256).toByte))
    }
  }
}
