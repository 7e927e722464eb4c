package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** REAL video container metadata: `video_meta(content)` parses the
  * ISO-BMFF (MP4/MOV) box structure — `moov/mvhd` for
  * timescale+duration, `moov/trak/tkhd` for track dimensions — and
  * the RIFF/AVI `avih` header ([[AviCodec]]), returning struct(width,
  * height, duration_ms); NULL for payloads in neither container. Pure
  * byte parsing, no codec — the container METADATA a pipeline needs
  * for frame sampling, resize planning, and size filtering is plain
  * bytes, like `image_dims` for images. PIXEL decode is real for
  * MJPEG in both containers ([[VideoFramePoolExpr]] — every frame is
  * a plain JPEG the JDK decodes: AVI `00dc` chunks, MOV/MP4 `jpeg`
  * sample tables via [[VideoCodec.framesJpeg]]); for codecs the JDK
  * ships no decoder for (H.264/VP9/…) the decode stage stays stubbed
  * behind the contract-tested seam.
  *
  * Parsing facts used (ISO/IEC 14496-12):
  *  - a box is [size:u32][type:4cc][payload]; size==1 → 64-bit
  *    largesize follows the type; size==0 → box runs to EOF;
  *  - `mvhd` v0 carries timescale:u32/duration:u32 at payload offsets
  *    12/16, v1 at 20/24 with duration:u64;
  *  - `tkhd`'s fixed-point 16.16 width/height are its LAST 8 payload
  *    bytes in both versions (dims of the widest track win — a movie
  *    can carry audio-only traks whose dims are 0).
  * duration_ms = duration · 1000 / timescale. */
case class VideoMetaExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"video_meta expects binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "video_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val m = VideoCodec.parseMeta(input.asInstanceOf[Array[Byte]])
    if (m == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        if (m.width > 0) Int.box(m.width) else null,
        if (m.height > 0) Int.box(m.height) else null,
        if (m.durationMs >= 0) Long.box(m.durationMs) else null))
  }

  override protected def withNewChildInternal(
      newChild: Expression): VideoMetaExpr = copy(child = newChild)
}

object VideoMetaExpr {
  val Name = "video_meta"
  private[plans] val info = new ExpressionInfo(classOf[VideoMetaExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 1,
      s"video_meta expects 1 argument (content), got ${children.size}")
    VideoMetaExpr(children(0))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** ISO-BMFF box walking shared by the expression (parse) and the
  * fixture/test builders (a minimal-but-genuine `ftyp`+`moov` writer —
  * the same byte layout any MP4 muxer emits for these fields). */
object VideoCodec {

  /** Recursion bound for the box walks: legal ISO-BMFF nests
    * moov>trak>mdia>minf>stbl ~5 deep; anything deeper is a crafted
    * or bit-rotted chain and parses to null rather than recursing
    * toward StackOverflowError. */
  private[plans] val MaxBoxDepth = 16

  final case class Meta(width: Int, height: Int, durationMs: Long)

  /** Container metadata, or null when the bytes are neither ISO-BMFF
    * (no parseable top-level box chain containing a `moov`) nor
    * RIFF/AVI (delegated to [[AviCodec]] — big-endian box walk here,
    * little-endian chunk walk there; same discipline). */
  def parseMeta(bytes: Array[Byte]): Meta = {
    if (bytes.length < 16) return null
    val avi = AviCodec.meta(bytes)
    if (avi != null)
      return Meta(avi.width, avi.height, avi.durationMs)
    var width = 0
    var height = 0
    var durationMs = -1L
    var sawMoov = false

    def u32(off: Int): Long =
      ((bytes(off) & 0xFFL) << 24) | ((bytes(off + 1) & 0xFFL) << 16) |
        ((bytes(off + 2) & 0xFFL) << 8) | (bytes(off + 3) & 0xFFL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")

    // Walk the box chain in [start, end); returns false on a malformed
    // chain (a size that escapes the window or loops). Depth is capped:
    // legal files nest moov>trak>mdia>minf>stbl ~5 deep, and without a
    // cap a crafted payload of a few thousand self-nested 8-byte boxes
    // recurses into StackOverflowError — an Error nothing catches —
    // violating the parse-or-null totality contract.
    def walk(start: Int, end: Int, depth: Int,
             inMoov: Boolean, inTrak: Boolean): Boolean = {
      if (depth > VideoCodec.MaxBoxDepth) return false
      var p = start
      while (p + 8 <= end) {
        val size0 = u32(p)
        val typ = fourcc(p + 4)
        var header = 8
        val size =
          if (size0 == 1L) {
            if (p + 16 > end) return false
            header = 16
            u64(p + 8)
          } else if (size0 == 0L) (end - p).toLong
          else size0
        if (size < header || p + size > end) return false
        val payload = p + header
        val payloadEnd = (p + size).toInt
        typ match {
          case "moov" if depth == 0 =>
            sawMoov = true
            if (!walk(payload, payloadEnd, depth + 1,
              inMoov = true, inTrak = false)) return false
          case "trak" if inMoov =>
            if (!walk(payload, payloadEnd, depth + 1,
              inMoov = true, inTrak = true)) return false
          case "mvhd" if inMoov && !inTrak =>
            if (payload + 4 > payloadEnd) return false
            val v = bytes(payload) & 0xFF
            val (ts, dur) =
              if (v == 1) {
                if (payload + 32 > payloadEnd) return false
                (u32(payload + 20), u64(payload + 24))
              } else {
                if (payload + 20 > payloadEnd) return false
                (u32(payload + 12), u32(payload + 16))
              }
            if (ts > 0) durationMs = dur * 1000L / ts
          case "tkhd" if inTrak =>
            if (payloadEnd - 8 < payload) return false
            val w = (u32(payloadEnd - 8) >> 16).toInt // 16.16 fixed
            val h = (u32(payloadEnd - 4) >> 16).toInt
            if (w > width) width = w
            if (h > height) height = h
          case _ => () // mdat, ftyp, free, udta, … — skipped whole
        }
        p = payloadEnd
      }
      p == end || depth > 0
    }

    if (!walk(0, bytes.length, 0, inMoov = false, inTrak = false)) return null
    if (!sawMoov) return null
    Meta(width, height, durationMs)
  }

  /** MJPEG sample payloads (each a standalone JPEG) from an ISO-BMFF
    * (MOV/MP4) container, in sample order — or null when the bytes are
    * not parseable ISO-BMFF, carry no video trak whose `stsd` sample
    * entry is the `jpeg` codec (the QuickTime photo-JPEG fourcc: each
    * sample is a plain JFIF the JDK decodes; `mjpa`/`avc1`/`vp09`
    * frames are NOT standalone JPEGs and stay behind the decode stub),
    * or carry a sample table whose offsets escape the buffer.
    *
    * Sample-table facts used (ISO/IEC 14496-12 §8.5-8.7):
    *  - `stsd` leads with entry_count; each entry is
    *    [size:u32][format:4cc][…] — format is the codec;
    *  - `stsz` is [sample_size:u32][count:u32] with per-sample u32
    *    sizes following only when sample_size == 0;
    *  - `stco`/`co64` hold per-chunk ABSOLUTE file offsets (u32/u64);
    *  - `stsc` runs of (first_chunk, samples_per_chunk, sdi) map
    *    samples onto chunks; samples are contiguous within a chunk.
    * The same walk discipline as [[parseMeta]]: malformed chains
    * (sizes escaping their window) yield null, never a crash — crawl
    * corpora always carry truncated files. */
  def framesJpeg(bytes: Array[Byte]): Array[Array[Byte]] = {
    if (bytes.length < 16) return null
    def u16(off: Int): Int =
      ((bytes(off) & 0xFF) << 8) | (bytes(off + 1) & 0xFF)
    def u32(off: Int): Long =
      ((bytes(off) & 0xFFL) << 24) | ((bytes(off + 1) & 0xFFL) << 16) |
        ((bytes(off + 2) & 0xFFL) << 8) | (bytes(off + 3) & 0xFFL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")

    // Per-trak sample-table state, filled as the walk passes stbl.
    final class Trak {
      var fmt: String = null
      var sizes: Array[Long] = null // per-sample, expanded from stsz
      var chunkOffsets: Array[Long] = null
      var stsc: Array[(Long, Long)] = null // (first_chunk, samples/chunk)
    }
    val traks = scala.collection.mutable.ArrayBuffer.empty[Trak]
    var sawMoov = false

    def walk(start: Int, end: Int, depth: Int, inMoov: Boolean,
             cur: Trak): Boolean = {
      if (depth > MaxBoxDepth) return false // see parseMeta's walk
      var p = start
      while (p + 8 <= end) {
        val size0 = u32(p)
        val typ = fourcc(p + 4)
        var header = 8
        val size =
          if (size0 == 1L) {
            if (p + 16 > end) return false
            header = 16
            u64(p + 8)
          } else if (size0 == 0L) (end - p).toLong
          else size0
        if (size < header || p + size > end) return false
        val payload = p + header
        val payloadEnd = (p + size).toInt
        typ match {
          case "moov" if depth == 0 =>
            sawMoov = true
            if (!walk(payload, payloadEnd, depth + 1, inMoov = true,
              cur = null)) return false
          case "trak" if inMoov && cur == null =>
            val t = new Trak
            traks += t
            if (!walk(payload, payloadEnd, depth + 1, inMoov = true,
              cur = t)) return false
          case "mdia" | "minf" | "stbl" if cur != null =>
            if (!walk(payload, payloadEnd, depth + 1, inMoov = true,
              cur = cur)) return false
          case "stsd" if cur != null =>
            // vf(4) + entry_count(4) + first entry [size][format].
            if (payload + 16 > payloadEnd) return false
            if (u32(payload + 4) >= 1) cur.fmt = fourcc(payload + 12)
          case "stsz" if cur != null =>
            if (payload + 12 > payloadEnd) return false
            val fixed = u32(payload + 4)
            val n = u32(payload + 8)
            if (n < 0 || n > (1 << 22)) return false
            cur.sizes =
              if (fixed != 0) Array.fill(n.toInt)(fixed)
              else {
                if (payload + 12 + n * 4 > payloadEnd) return false
                Array.tabulate(n.toInt)(i => u32(payload + 12 + i * 4))
              }
          case "stco" | "co64" if cur != null =>
            if (payload + 8 > payloadEnd) return false
            val n = u32(payload + 4)
            val w = if (typ == "stco") 4 else 8
            if (n < 0 || payload + 8 + n * w > payloadEnd) return false
            cur.chunkOffsets = Array.tabulate(n.toInt)(i =>
              if (w == 4) u32(payload + 8 + i * 4)
              else u64(payload + 8 + i * 8))
          case "stsc" if cur != null =>
            if (payload + 8 > payloadEnd) return false
            val n = u32(payload + 4)
            if (n < 0 || payload + 8 + n * 12 > payloadEnd) return false
            cur.stsc = Array.tabulate(n.toInt)(i => (
              u32(payload + 8 + i * 12), u32(payload + 8 + i * 12 + 4)))
          case _ => () // mdat, ftyp, mvhd, tkhd, hdlr, dinf, … skipped
        }
        p = payloadEnd
      }
      p == end || depth > 0
    }

    if (!walk(0, bytes.length, 0, inMoov = false, cur = null)) return null
    if (!sawMoov) return null
    val t = traks.find(t => t.fmt == "jpeg" && t.sizes != null &&
      t.chunkOffsets != null && t.stsc != null && t.stsc.nonEmpty)
      .getOrElse(return null)
    // Expand chunk mapping: stsc runs are (first_chunk, samples/chunk)
    // with first_chunk 1-based and each run covering chunks up to the
    // next run's first_chunk.
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var sample = 0
    var run = 0
    var chunk = 1L
    while (sample < t.sizes.length && chunk <= t.chunkOffsets.length) {
      while (run + 1 < t.stsc.length && t.stsc(run + 1)._1 <= chunk)
        run += 1
      val perChunk = t.stsc(run)._2
      if (perChunk <= 0) return null
      var off = t.chunkOffsets((chunk - 1).toInt)
      var k = 0L
      while (k < perChunk && sample < t.sizes.length) {
        val sz = t.sizes(sample)
        if (off < 0 || sz < 0 || off + sz > bytes.length) return null
        out += java.util.Arrays.copyOfRange(bytes, off.toInt,
          (off + sz).toInt)
        off += sz
        sample += 1
        k += 1
      }
      chunk += 1
    }
    if (sample < t.sizes.length) return null // table promises more
    out.toArray
  }

  /** A minimal genuine MP4 skeleton: `ftyp` + `moov{mvhd, trak{tkhd}}`
    * (+ an empty `mdat`), byte-identical in layout to what a muxer
    * writes for these fields. Fixture/test builder only. */
  def encodeMp4Skeleton(width: Int, height: Int, durationMs: Long,
                        timescale: Int = 1000): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp",
      "isomiso2".getBytes("US-ASCII")) // major brand + minor as bytes
    val mvhdP = java.nio.ByteBuffer.allocate(100)
    mvhdP.putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // ctime, mtime
      .putInt(timescale)
      .putInt((durationMs * timescale / 1000L).toInt)
    val mvhd = box("mvhd", mvhdP.array())
    val tkhdP = java.nio.ByteBuffer.allocate(84)
    tkhdP.position(76)
    tkhdP.putInt(width << 16).putInt(height << 16)
    val tkhd = box("tkhd", tkhdP.array())
    val trak = box("trak", tkhd)
    val moov = box("moov", mvhd ++ trak)
    val mdat = box("mdat", Array.empty[Byte])
    ftyp ++ moov ++ mdat
  }

  /** A minimal genuine photo-JPEG MOV/MP4: `ftyp` + `mdat` holding the
    * JPEG samples + `moov` with the COMPLETE sample table
    * (`stsd('jpeg')`, `stts`, `stsc`, `stsz`, `stco`) — the byte
    * layout a QuickTime MJPEG muxer writes for these fields, so the
    * decode side must run the real box walk AND sample-table
    * expansion. moov-last (the file-writer layout; progressive-
    * download muxers put it first — [[framesJpeg]] walks either).
    * Fixture/test builder only. */
  def encodeMovMjpeg(width: Int, height: Int, usecPerFrame: Long,
                     jpegFrames: Seq[Array[Byte]],
                     timescale: Int = 1000,
                     samplesPerChunk: Int = 0,
                     useCo64: Boolean = false): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    def be32(vs: Long*): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(vs.length * 4)
      vs.foreach(v => b.putInt(v.toInt))
      b.array()
    }
    val n = jpegFrames.size
    val delta = usecPerFrame * timescale / 1000000L
    val duration = n * delta
    // Major brand 'qt  ', minor version, compatible brand 'qt  '.
    val ftyp = box("ftyp", "qt  ".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 2, 0) ++ "qt  ".getBytes("US-ASCII"))
    val mdatPayload = jpegFrames.toArray.flatten
    val mdat = box("mdat", mdatPayload)
    val chunkOffset = ftyp.length + 8L // first sample starts mdat payload

    val mvhdP = java.nio.ByteBuffer.allocate(100)
    mvhdP.putInt(0).putInt(0).putInt(0)
      .putInt(timescale).putInt(duration.toInt)
    val mvhd = box("mvhd", mvhdP.array())
    val tkhdP = java.nio.ByteBuffer.allocate(84)
    tkhdP.putInt(0x0000000F) // version 0, flags: enabled+in-movie
      .putInt(0).putInt(0).putInt(1) // ctime, mtime, track id
      .putInt(0).putInt(duration.toInt)
    tkhdP.position(76)
    tkhdP.putInt(width << 16).putInt(height << 16)
    val tkhd = box("tkhd", tkhdP.array())
    val mdhdP = java.nio.ByteBuffer.allocate(24)
    mdhdP.putInt(0).putInt(0).putInt(0)
      .putInt(timescale).putInt(duration.toInt)
    val mdhd = box("mdhd", mdhdP.array())
    val hdlr = box("hdlr",
      be32(0, 0) ++ "vide".getBytes("US-ASCII") ++ be32(0, 0, 0) ++
        Array(0.toByte))
    val vmhd = box("vmhd", be32(1, 0))
    val dinf = box("dinf", box("dref",
      be32(0, 1) ++ box("url ", be32(1)))) // self-contained data ref
    // Visual sample entry (86 bytes): format 'jpeg', dims, 72 dpi,
    // 1 frame/sample, 32-byte compressor name, 24-bit depth.
    val entry = java.nio.ByteBuffer.allocate(86)
    entry.putInt(86).put("jpeg".getBytes("US-ASCII"))
      .put(new Array[Byte](6)).putShort(1) // reserved, data-ref index
      .putShort(0).putShort(0).putInt(0).putInt(0).putInt(0)
      .putShort(width.toShort).putShort(height.toShort)
      .putInt(0x00480000).putInt(0x00480000) // 72 dpi fixed-point
      .putInt(0).putShort(1) // reserved, frame count
      .put(new Array[Byte](32)) // compressor name (pascal, zeroed)
      .putShort(24).putShort(-1) // depth, pre_defined
    val stsd = box("stsd", be32(0, 1) ++ entry.array())
    val stts = box("stts", be32(0, 1, n, delta))
    // Chunking: all samples in one chunk (samplesPerChunk == 0, the
    // common single-chunk layout) or fixed-size chunks with a
    // possibly-short tail — which makes stsc a genuine TWO-run table
    // the parser must expand, not a single-entry degenerate.
    val spc = if (samplesPerChunk <= 0) math.max(n, 1) else samplesPerChunk
    val chunks: Seq[Seq[Array[Byte]]] = jpegFrames.grouped(spc).toSeq
    val chunkOffsets = chunks.scanLeft(chunkOffset)(
      (off, c) => off + c.map(_.length.toLong).sum).init
    // Run-length compress samples-per-chunk into stsc entries.
    val stscRuns = chunks.map(_.size).zipWithIndex
      .foldLeft(Seq.empty[(Int, Int)]) { case (acc, (sz, i)) =>
        if (acc.nonEmpty && acc.last._2 == sz) acc
        else acc :+ ((i + 1, sz))
      }
    val stsc = box("stsc", be32(
      Seq(0L, stscRuns.size.toLong) ++
        stscRuns.flatMap { case (fc, sz) =>
          Seq(fc.toLong, sz.toLong, 1L) }: _*))
    val stsz = box("stsz",
      be32(Seq(0L, 0L, n.toLong) ++ jpegFrames.map(_.length.toLong): _*))
    // co64 is the 64-bit chunk-offset table large files carry (any
    // mdat past 4 GiB forces it); same semantics, wider entries.
    val stco =
      if (useCo64) {
        val b = java.nio.ByteBuffer.allocate(8 + chunkOffsets.size * 8)
        b.putInt(0).putInt(chunkOffsets.size)
        chunkOffsets.foreach(b.putLong)
        box("co64", b.array())
      } else box("stco", be32(
        Seq(0L, chunkOffsets.size.toLong) ++ chunkOffsets: _*))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ mdat ++ moov
  }
}
