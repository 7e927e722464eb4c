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
  * MJPEG-in-AVI ([[VideoFramePoolExpr]] — every frame is a plain JPEG
  * the JDK decodes); for codecs the JDK ships no decoder for
  * (H.264/VP9/…) the decode stage stays stubbed behind the
  * contract-tested seam.
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
    // chain (a size that escapes the window or loops).
    def walk(start: Int, end: Int, depth: Int,
             inMoov: Boolean, inTrak: Boolean): Boolean = {
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
}
