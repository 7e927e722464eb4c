package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2 (engine half) — streaming XML record extraction, the port of the
  * reference's `xmlstream` splitter (utils.py:448-507): emit every
  * element whose LOCAL name matches `tag` from a large XML document
  * without DOM-loading it, namespace-prefix agnostic.
  *
  * The scanner is a single forward pass that understands just enough
  * XML lexical structure to be safe on real feeds: comments, processing
  * instructions, CDATA sections (an OAI/IMSLP record may embed escaped
  * markup — including fake closing tags — inside CDATA), quoted
  * attribute values (which may legally contain `>`), self-closing
  * elements, and nested same-name elements (the outermost is emitted,
  * matching the reference's `skip=1` usage for nested tags).
  *
  * Scale shape: one task per file (binaryFile granularity, like the
  * reference which streams one file per task); the per-record work
  * downstream is columnar. A 100 TB feed arrives as many files, so
  * parallelism is the file count.
  */
object Xml {

  /** Lazily emit every outermost element with local name `tag`. */
  def splitByTag(xml: String, tag: String): Iterator[String] =
    new Iterator[String] {
      private var pos = 0
      private var nextRec: String = null

      private def localName(name: String): String = {
        val c = name.indexOf(':')
        if (c >= 0) name.substring(c + 1) else name
      }

      /** Index just past the real `>` of a tag starting at `lt`,
        * skipping quoted attribute values; also reports self-closing. */
      private def tagEnd(s: String, lt: Int): (Int, Boolean) = {
        var i = lt + 1
        var quote: Char = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if (quote != 0) { if (c == quote) quote = 0 }
          else if (c == '"' || c == '\'') quote = c
          else if (c == '>') return (i + 1, s.charAt(i - 1) == '/')
          i += 1
        }
        (s.length, false)
      }

      /** Skip non-element constructs; returns new position or -1 if the
        * char at `lt` starts an element tag. */
      private def skipNonElement(s: String, lt: Int): Int =
        if (s.startsWith("<!--", lt)) {
          val e = s.indexOf("-->", lt); if (e < 0) s.length else e + 3
        } else if (s.startsWith("<![CDATA[", lt)) {
          val e = s.indexOf("]]>", lt); if (e < 0) s.length else e + 3
        } else if (s.startsWith("<!", lt)) {
          val e = s.indexOf('>', lt); if (e < 0) s.length else e + 1
        } else if (s.startsWith("<?", lt)) {
          val e = s.indexOf("?>", lt); if (e < 0) s.length else e + 2
        } else -1

      private def nameAt(s: String, lt: Int): String = {
        var i = if (s.charAt(lt + 1) == '/') lt + 2 else lt + 1
        val start = i
        while (i < s.length && !" \t\r\n/>".contains(s.charAt(i))) i += 1
        s.substring(start, i)
      }

      private def advance(): Unit = {
        nextRec = null
        val s = xml
        while (nextRec == null && pos < s.length) {
          val lt = s.indexOf('<', pos)
          if (lt < 0) { pos = s.length; return }
          val skipped = skipNonElement(s, lt)
          if (skipped >= 0) pos = skipped
          // A trailing '<' with nothing after it (truncated feed):
          // treat as end of input, like any other unterminated tail.
          else if (lt + 1 >= s.length) pos = s.length
          else if (s.charAt(lt + 1) == '/')
            pos = tagEnd(s, lt)._1
          else if (localName(nameAt(s, lt)) != tag)
            pos = tagEnd(s, lt)._1
          else {
            // Element start for our tag: scan to the matching close at
            // depth 0, tracking nested same-name elements and CDATA.
            val (afterStart, selfClosing) = tagEnd(s, lt)
            if (selfClosing) { nextRec = s.substring(lt, afterStart); pos = afterStart }
            else {
              var i = afterStart
              var depth = 0
              while (nextRec == null && i < s.length) {
                val k = s.indexOf('<', i)
                if (k < 0) i = s.length
                else {
                  val sk = skipNonElement(s, k)
                  if (sk >= 0) i = sk
                  else if (k + 1 >= s.length) i = s.length
                  else {
                    val closing = s.charAt(k + 1) == '/'
                    val same = localName(nameAt(s, k)) == tag
                    val (after, self) = tagEnd(s, k)
                    if (same && closing) {
                      if (depth == 0) { nextRec = s.substring(lt, after); pos = after }
                      else depth -= 1
                    } else if (same && !self) depth += 1
                    i = after
                  }
                }
              }
              if (nextRec == null) pos = s.length // unterminated: drop
            }
          }
        }
      }

      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): String = {
        val r = nextRec; advance(); r
      }
    }

  /** All `tag` records of every XML file under `path` (glob ok), with
    * file provenance: (path, xml). */
  def recordsFromFiles(spark: SparkSession, path: String, tag: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        splitByTag(new String(bytes, "UTF-8"), tag).map(r => (p, r))
      }
      .toDF("path", "xml")
  }
}
