package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S14 — WARC record scan (ISO 28500, the container every web-crawl
  * corpus ships in: Common Crawl, heritrix output, wget --warc). The
  * S5/S6 archive discipline applied to the crawl container: one task
  * per .warc(.gz) file via the binaryFile source, per-partition
  * streaming record split, plain DataFrame from there on — pairs with
  * the HTML extractor (t16/pipe30) to make the engine crawl-native
  * end-to-end: WARC bytes → records → html_extract → funnel.
  *
  * Format facts used (ISO 28500 §4): a record is a version line
  * `WARC/1.x`, CRLF-separated named headers, CRLF CRLF, then EXACTLY
  * `Content-Length` payload bytes, then CRLF CRLF before the next
  * record. `.warc.gz` files compress EACH RECORD as its own gzip
  * member (ISO 28500 annex D — the layout that makes records
  * independently seekable); java's GZIPInputStream reads concatenated
  * members natively, so the same path serves plain and per-member
  * compressed files.
  *
  * For records whose WARC Content-Type is `application/http…`
  * (response/request), the HTTP message head is split off: status
  * parsed from an `HTTP/…` status line (null for requests), the inner
  * Content-Type header surfaced, payload = the HTTP body. Other
  * records (warcinfo, metadata, …) carry the WARC-level Content-Type
  * and the raw block.
  *
  * TOTALITY: crawl files truncate — a record whose declared
  * Content-Length escapes the buffer is dropped and the scan stops at
  * it; junk between records (anything that is not a `WARC/` version
  * line after CRLF padding) ends the file's scan rather than
  * throwing. WarcSpec + a ScalaCheck property pin parse-or-stop on
  * corruption, truncation at every length, and mux→parse round-trip.
  */
object Warc {

  /** One parsed record. `httpStatus` is -1 for "none" at the codec
    * level (case-class cleanliness); the scan surfaces it as a
    * nullable int column. */
  final case class Rec(warcType: String, targetUri: String,
                       contentType: String, httpStatus: Int,
                       payload: Array[Byte])

  private val Crlf = "\r\n"

  /** Parse every complete record in `bytes` (already decompressed).
    * Total: malformed or truncated input yields the records parsed
    * before the fault, never a throw. */
  def parse(bytes: Array[Byte]): Seq[Rec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Rec]
    var pos = 0
    val n = bytes.length

    def findCrlfCrlf(from: Int): Int = {
      var i = from
      while (i + 3 < n) {
        if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
        i += 1
      }
      -1
    }

    var ok = true
    while (ok) {
      // Inter-record padding: the spec's two CRLFs, tolerantly any run.
      while (pos < n && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      val he = if (pos + 5 <= n &&
        new String(bytes, pos, 5, "ISO-8859-1") == "WARC/")
        findCrlfCrlf(pos) else -1
      if (he < 0) ok = false
      else {
        val head = new String(bytes, pos, he - pos, "ISO-8859-1")
        val lines = head.split(Crlf)
        def header(name: String): Option[String] = lines.iterator.drop(1)
          .map(_.split(":", 2))
          .collectFirst {
            case Array(k, v) if k.trim.equalsIgnoreCase(name) => v.trim
          }
        val lenOk = header("Content-Length").flatMap(_.toLongOption)
          .filter(l => l >= 0 && he + 4 + l <= n)
        lenOk match {
          case None => ok = false // missing/bad/escaping length: stop
          case Some(len) =>
            val bodyStart = he + 4
            val block = java.util.Arrays.copyOfRange(
              bytes, bodyStart, bodyStart + len.toInt)
            val warcCt = header("Content-Type").getOrElse("")
            val rec =
              if (warcCt.startsWith("application/http"))
                parseHttp(header("WARC-Type").getOrElse(""),
                  header("WARC-Target-URI").orNull, block)
              else Rec(header("WARC-Type").getOrElse(""),
                header("WARC-Target-URI").orNull,
                if (warcCt.isEmpty) null else warcCt, -1, block)
            out += rec
            pos = bodyStart + len.toInt
        }
      }
    }
    out.toSeq
  }

  /** Split an application/http block: head up to CRLF CRLF (or the
    * whole block when absent — a truncated message is all head),
    * status from an HTTP/ status line, inner Content-Type, body. */
  private def parseHttp(warcType: String, uri: String,
                        block: Array[Byte]): Rec = {
    var he = -1
    var i = 0
    while (he < 0 && i + 3 < block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' &&
        block(i + 2) == '\r' && block(i + 3) == '\n') he = i
      i += 1
    }
    val headEnd = if (he < 0) block.length else he
    val head = new String(block, 0, headEnd, "ISO-8859-1")
    val lines = head.split(Crlf)
    val status =
      if (lines.nonEmpty && lines(0).startsWith("HTTP/")) {
        val parts = lines(0).split(" ")
        if (parts.length >= 2) parts(1).toIntOption.getOrElse(-1) else -1
      } else -1
    val ct = lines.iterator.drop(1).map(_.split(":", 2))
      .collectFirst {
        case Array(k, v) if k.trim.equalsIgnoreCase("Content-Type") =>
          v.trim
      }.orNull
    val body =
      if (he < 0) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(block, he + 4, block.length)
    Rec(warcType, uri, ct, status, body)
  }

  // ---- muxer (fixtures/tests): genuine ISO 28500 bytes ----

  /** One record's bytes: version line, headers, CRLF CRLF, payload,
    * CRLF CRLF trailer. Header VALUES are CR/LF-sanitized: a hostile
    * target URI embedding a line break would otherwise inject headers
    * and desynchronize the whole file (the payload is length-framed
    * and carries anything; headers must stay single-line). */
  def encodeRecord(warcType: String, targetUri: String,
                   contentType: String, payload: Array[Byte],
                   recordId: String): Array[Byte] = {
    def clean(v: String): String =
      v.replace("\r", "").replace("\n", "")
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(Crlf)
    sb.append("WARC-Type: ").append(clean(warcType)).append(Crlf)
    sb.append("WARC-Record-ID: <urn:uuid:").append(clean(recordId))
      .append(">").append(Crlf)
    sb.append("WARC-Date: 2026-01-01T00:00:00Z").append(Crlf)
    if (targetUri != null)
      sb.append("WARC-Target-URI: ").append(clean(targetUri)).append(Crlf)
    sb.append("Content-Type: ").append(clean(contentType)).append(Crlf)
    sb.append("Content-Length: ").append(payload.length).append(Crlf)
    sb.append(Crlf)
    val head = sb.toString.getBytes("ISO-8859-1")
    head ++ payload ++ (Crlf + Crlf).getBytes("ISO-8859-1")
  }

  /** An HTTP response block for a response record's payload. */
  def encodeHttpResponse(status: Int, reason: String, contentType: String,
                         body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 $status $reason" + Crlf +
      s"Content-Type: $contentType" + Crlf +
      s"Content-Length: ${body.length}" + Crlf + Crlf)
      .getBytes("ISO-8859-1") ++ body

  /** Gzip one record as its OWN member (the .warc.gz layout). */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(record); g.finish(); g.close()
    bos.toByteArray
  }

  /** WARC SINK — the write half of the S-family symmetry (a curation
    * pipeline re-emits its filtered crawl as WARC for the next
    * consumer): one `.warc.gz` per partition, each record its own
    * gzip member (the annex-D layout [[records]] reads back), written
    * DISTRIBUTED via foreachPartition. Input columns: `target_uri`
    * (string), `http_status` (int), `content_type` (string), `body`
    * (binary). Record ids derive from partition/row position —
    * deterministic under a fixed partitioning. Local-FS semantics
    * like every fixture writer here; a cluster deployment points
    * `dir` at a shared FS. */
  def writeResponses(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.select(col("target_uri"), col("http_status"), col("content_type"),
        col("body"))
      .as[(String, Int, String, Array[Byte])]
      .foreachPartition {
        (it: Iterator[(String, Int, String, Array[Byte])]) =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val f = java.nio.file.Paths.get(dir)
            .resolve(f"part-$pid%05d.warc.gz")
          val out = java.nio.file.Files.newOutputStream(f)
          try {
            var i = 0
            it.foreach { case (uri, status, ct, body) =>
              val reason = if (status == 200) "OK" else "S" + status
              out.write(gzipMember(encodeRecord("response", uri,
                "application/http;msgtype=response",
                encodeHttpResponse(status, reason, ct, body),
                f"w-$pid%d-$i%d")))
              i += 1
            }
          } finally out.close()
      }
  }

  /** All records of every .warc(.gz) under `path`, with provenance.
    * Output: path, warc_type, target_uri, http_status (nullable int),
    * content_type, payload (binary). */
  def records(spark: SparkSession, path: String,
              gzipped: Boolean = true): DataFrame =
    recordsOf(spark.read.format("binaryFile").load(path), gzipped)

  /** The record split over an already-loaded binaryFile frame
    * (`path`, `content` columns) — shared by [[records]] and the
    * streaming ingestion ([[graft.streaming.StreamingWarc]]), so the
    * two paths cannot drift. */
  def recordsOf(files: DataFrame, gzipped: Boolean = true): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, raw) =>
        val bytes =
          if (gzipped) {
            // Multi-member gzip: GZIPInputStream consumes every member.
            try {
              val buf = new java.io.ByteArrayOutputStream()
              val in = new GZIPInputStream(new ByteArrayInputStream(raw))
              val chunk = new Array[Byte](64 * 1024)
              Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
                .foreach(k => buf.write(chunk, 0, k))
              buf.toByteArray
            } catch { case _: java.io.IOException => Array.emptyByteArray }
          } else raw
        parse(bytes).map(r => (p, r.warcType, r.targetUri,
          if (r.httpStatus < 0) None else Some(r.httpStatus),
          Option(r.contentType), r.payload))
      }
      .toDF("path", "warc_type", "target_uri", "http_status",
        "content_type", "payload")
  }
}
