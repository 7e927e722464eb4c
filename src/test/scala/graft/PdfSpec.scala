package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.PdfCodec

/** The PDF text-extraction contract (plans/PdfExpr): mux→extract
  * round-trips, content-stream operator semantics (Tj/'/TJ, escapes,
  * nesting, octal, hex strings, line moves), and parse-or-null
  * totality on junk/corruption/truncation. Cross-engine truth is
  * m15's oracle; this is the local truth for the operator-language
  * corners the fixture can't carry. */
class PdfSpec extends AnyFunSuite {

  test("mux→extract round-trip: pages in order, newline-joined") {
    val r = PdfCodec.extract(PdfCodec.encodePdf(Seq(
      "first page body text", "second page here", "and a third")))
    assert(r.text == "first page body text\nsecond page here\nand a third")
    assert(r.pages == 3 && r.version == "1.4")
  }

  test("special characters round-trip through literal-string escaping") {
    val texts = Seq("parens (nested (deep)) stay", "back\\slash",
      "mixed ) one ( two \\ three", "tabs\tand\rreturns")
    val r = PdfCodec.extract(PdfCodec.encodePdf(texts))
    // \n inside a page's text would split lines by the muxer's own
    // escape (\n literal); these inputs carry none.
    assert(r.text == texts.mkString("\n"))
  }

  test("content-stream operators: TJ arrays, hex strings, quote ops, octal") {
    def pdfWith(content: String): Array[Byte] = {
      // splice a custom RAW (unfiltered) content stream into a shell
      val shell = new String(PdfCodec.encodePdf(Seq("x")), "ISO-8859-1")
      val patched = shell.replaceAll(
        "(?s)<< /Length \\d+ /Filter /FlateDecode >>\\nstream\\n.*?\\nendstream",
        java.util.regex.Matcher.quoteReplacement(
          s"<< /Length ${content.length} >>\nstream\n$content\nendstream"))
      patched.getBytes("ISO-8859-1")
    }
    // TJ: strings concatenate, kerning numbers vanish.
    assert(PdfCodec.extract(pdfWith(
      "BT [(Hel) -20 (lo) 5 ( wor) (ld)] TJ ET")).text == "Hello world")
    // Hex strings, incl. odd-digit padding and embedded whitespace.
    assert(PdfCodec.extract(pdfWith(
      "BT <48 65 6C6C 6F> Tj ET")).text == "Hello")
    assert(PdfCodec.extract(pdfWith("BT <7> Tj ET")).text == "p")
    // ' shows on the NEXT line.
    assert(PdfCodec.extract(pdfWith(
      "BT (one) Tj (two) ' ET")).text == "one\ntwo")
    // Td/T* are line moves; their numeric operands are not text.
    assert(PdfCodec.extract(pdfWith(
      "BT 12 0 Td (a b c) Tj T* (d e) Tj ET")).text == "a b c\nd e")
    // Octal escapes and line continuation.
    assert(PdfCodec.extract(pdfWith(
      "BT (A\\101\\56 cont\\\ninued) Tj ET")).text == "AA. continued")
    // An unshown string (no Tj before another op) is discarded.
    assert(PdfCodec.extract(pdfWith(
      "BT (ghost) 1 0 0 1 72 720 Tm (real text here) Tj ET")).text ==
      "real text here")
  }

  test("CID mux→extract round-trip through the ToUnicode CMap") {
    val pages = Seq("Hello CID 日本語テキスト page",
      "second 中文資料 page", "plain ascii tail")
    val r = PdfCodec.extract(PdfCodec.encodePdfCid(pages))
    assert(r.text == pages.mkString("\n") && r.pages == 3)
    // BMP-wide coverage incl. symbols; the rank-based code map means a
    // match requires genuinely reading the CMap.
    val wide = Seq("αβγδ Ωμ", "кириллица", "한국어 텍스트")
    assert(PdfCodec.extract(PdfCodec.encodePdfCid(wide)).text ==
      wide.mkString("\n"))
  }

  test("ToUnicode grammar: bfchar, increment bfrange, array bfrange, ligature dst") {
    val cm = PdfCodec.parseToUnicode(
      ("""/CIDInit /ProcSet findresource begin
         |begincmap
         |1 begincodespacerange <0000> <FFFF> endcodespacerange
         |2 beginbfchar
         |<0100> <65E5>
         |<0101> <0041>
         |endbfchar
         |2 beginbfrange
         |<0200> <0202> <0061>
         |<0300> <0301> [<00660066> <0067>]
         |endbfrange
         |endcmap""".stripMargin).getBytes("ISO-8859-1"))
    assert(cm(0x0100) == "日" && cm(0x0101) == "A")
    assert(cm(0x0200) == "a" && cm(0x0201) == "b" && cm(0x0202) == "c")
    assert(cm(0x0300) == "ff" && cm(0x0301) == "g") // multi-unit dst
    assert(!cm.contains(0x0302))
  }

  test("CID corners: unmapped codes drop, simple fonts unaffected, synth scopes") {
    // A content stream showing an unmapped code next to mapped ones.
    val pdf = PdfCodec.encodePdfCid(Seq("ab"))
    val s = new String(pdf, "ISO-8859-1")
    // Codes are rank-based from 0x0100; 0xEEEE is unmapped — splice it
    // into the shown hex string and the output must not change shape.
    assert(PdfCodec.extract(pdf).text == "ab")
    // pdf_synth's Latin-1-only contract (the CID muxer's reason to
    // exist): simple-font synthesis of non-Latin-1 text is null, not
    // mojibake.
    val cjk = org.apache.spark.unsafe.types.UTF8String.fromString("日本")
    assert(graft.plans.PdfSynthExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(cjk,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.catalyst.expressions.Literal(150)).eval() == null)
    // and Latin-1 text still synthesizes
    assert(PdfCodec.extract(PdfCodec.encodePdf(Seq("café"))).text == "café")
  }

  test("CID totality: truncation and corruption never throw") {
    val valid = PdfCodec.encodePdfCid(Seq("page 日本 one", "page two"))
    (0 to valid.length by 7).foreach { len =>
      PdfCodec.extract(java.util.Arrays.copyOf(valid, len)) // never throws
    }
    val rnd = new scala.util.Random(13)
    (0 until 300).foreach { _ =>
      val m = valid.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      PdfCodec.extract(m) // parse-or-degrade, never a throw
    }
  }

  test("totality: junk, truncation at every length, corruption") {
    assert(PdfCodec.extract("not a pdf at all".getBytes("UTF-8")) == null)
    assert(PdfCodec.extract(Array.emptyByteArray) == null)
    assert(PdfCodec.extract("%PDF-".getBytes("UTF-8")) == null)
    val valid = PdfCodec.encodePdf(Seq("alpha beta", "gamma"))
    (0 to valid.length by 7).foreach { len =>
      PdfCodec.extract(java.util.Arrays.copyOf(valid, len)) // never throws
    }
    val rnd = new scala.util.Random(11)
    (0 until 300).foreach { _ =>
      val m = valid.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      PdfCodec.extract(m) // parse-or-degrade, never a throw
    }
    // A Flate-declared stream whose bytes do not inflate is skipped,
    // the rest of the file still extracts.
    val twoPages = PdfCodec.encodePdf(Seq("page one", "page two"))
    val s = new String(twoPages, "ISO-8859-1")
    val firstStream = s.indexOf("stream\n") + "stream\n".length
    val broken = twoPages.clone()
    broken(firstStream) = 'X'.toByte
    val r = PdfCodec.extract(broken)
    assert(r != null && r.text.contains("page two"))
  }
}
