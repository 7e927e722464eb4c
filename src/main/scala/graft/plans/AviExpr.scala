package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** REAL video PIXEL decode for the container+codec families the JDK
  * can genuinely decode end-to-end: MJPEG frames — plain JPEGs — in
  * EITHER major container. RIFF/AVI payloads go through the
  * [[AviCodec]] chunk walk (`00dc` frames); ISO-BMFF (MOV/MP4)
  * payloads whose `stsd` sample entry is the `jpeg` codec go through
  * the [[VideoCodec.framesJpeg]] sample-table walk
  * (`stsz`/`stsc`/`stco` expansion). Each extracted frame runs
  * through the SAME `javax.imageio` decode + grid-cell channel-mean
  * pooling as still images ([[ImageCodec.decodeMeanPool]]). With
  * this, every modality's decode is real for at least one genuine
  * format — image (PNG/JPEG/BMP/GIF), audio (WAV/AIFF/AU PCM), video
  * (MJPEG in AVI and in MOV/MP4) — and the
  * [[graft.llm.Multimodal.decodeStub]] seam remains only for codecs
  * the JDK ships no decoder for (H.264/VP9/AV1 …), which is stated
  * truthfully there.
  *
  * `video_frame_pool(content, grid)` → array of per-frame feature
  * vectors (each `grid*grid*3` doubles in [0, 1], position layout
  * identical to `image_mean_pool`). NULL when the payload is neither
  * a parseable AVI nor a JPEG-codec ISO-BMFF; an individual frame
  * whose JPEG bytes are corrupt yields a NULL element (crawl corpora
  * always carry corrupt frames — drop with a filter, don't die
  * mid-job).
  *
  * One scalar expression so the whole decode runs inside the scan
  * projection — embarrassingly parallel, no shuffle. CodegenFallback:
  * one eval per VIDEO; the multi-frame decode inside dominates any
  * per-row fallback overhead. */
case class VideoFramePoolExpr(child: Expression, grid: Int)
  extends UnaryExpression with CodegenFallback {

  require(grid >= 1, s"video_frame_pool: grid must be >= 1, got $grid")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"video_frame_pool expects binary, got ${child.dataType.simpleString}")

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false),
      containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "video_frame_pool"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    // RIFF/AVI first (cheap magic check), then the ISO-BMFF
    // sample-table walk for photo-JPEG MOV/MP4.
    val avi = AviCodec.frames(bytes)
    val frames = if (avi != null) avi else VideoCodec.framesJpeg(bytes)
    if (frames == null) return null
    new GenericArrayData(frames.map { jpeg =>
      val pooled = ImageCodec.decodeMeanPool(jpeg, grid)
      if (pooled == null) null else new GenericArrayData(pooled)
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): VideoFramePoolExpr = copy(child = newChild)
}

object VideoFramePoolExpr {
  val Name = "video_frame_pool"
  private[plans] val info = new ExpressionInfo(classOf[VideoFramePoolExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 2,
      s"video_frame_pool expects 2 arguments (content, grid), got ${children.size}")
    require(children(1).foldable,
      s"video_frame_pool: grid must be a literal, got ${children(1)}")
    VideoFramePoolExpr(children(0),
      children(1).eval(null).asInstanceOf[Number].intValue())
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** Distributed MJPEG-AVI fixture synthesis — the media-synth family's
  * video member: `avi_synth(id, w, h, frames[, quality_pct])` → a real
  * RIFF/AVI whose `00dc` chunks are real JPEGs (quality_pct/100,
  * default 80) of [[ImageCodec.synthPixel]] avalanche noise (frame f
  * salts the id as `id·1009 + f`). The quality knob lets a fixture
  * express the crawl's RE-ENCODED-COPY shape: two videos built from
  * the same id at different qualities share pixels up to quantization
  * error — genuine content near-dups with different bytes. Fixture
  * machinery for decode-throughput benching, not an operator; like
  * `jpeg_synth` there is no exact pixel oracle (JPEG is lossy) —
  * decode correctness is gated by m6's constant-gray oracle. */
case class AviSynthExpr(id: Expression, w: Expression, h: Expression,
                        nFrames: Expression, qualityPct: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuinaryExpression
  with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(id, w, h, nFrames, qualityPct)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val ok = id.dataType == LongType && w.dataType == IntegerType &&
      h.dataType == IntegerType && nFrames.dataType == IntegerType &&
      qualityPct.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"avi_synth expects (long, int, int, int, int), got " +
        s"(${id.dataType.simpleString}, ${w.dataType.simpleString}, " +
        s"${h.dataType.simpleString}, ${nFrames.dataType.simpleString}, " +
        s"${qualityPct.dataType.simpleString})")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "avi_synth"

  override def nullSafeEval(idv: Any, wv: Any, hv: Any, nv: Any,
                            qv: Any): Any = {
    val i = idv.asInstanceOf[Long]
    val ww = wv.asInstanceOf[Int]
    val hh = hv.asInstanceOf[Int]
    val n = nv.asInstanceOf[Int]
    val q = qv.asInstanceOf[Int]
    require(ww >= 1 && hh >= 1 && ww <= 4096 && hh <= 4096 &&
      n >= 1 && n <= 512 && q >= 1 && q <= 100,
      s"avi_synth: dims/frames/quality out of range ($ww x $hh x $n @ $q)")
    AviCodec.encodeAviMjpeg(ww, hh, usecPerFrame = 40000L,
      (0 until n).map(f => AviCodec.encodeJpeg(ww, hh,
        (x, y) => ImageCodec.synthPixel(i * 1009L + f, ww, x, y),
        quality = q / 100.0f)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AviSynthExpr =
    copy(id = newChildren(0), w = newChildren(1), h = newChildren(2),
      nFrames = newChildren(3), qualityPct = newChildren(4))
}

object AviSynthExpr {
  val Name = "avi_synth"
  private[plans] val info = new ExpressionInfo(classOf[AviSynthExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 4 || children.size == 5,
      s"avi_synth expects 4 or 5 arguments (id, w, h, frames[, " +
        s"quality_pct]), got ${children.size}")
    AviSynthExpr(children(0), children(1), children(2), children(3),
      children.lift(4).getOrElse(
        org.apache.spark.sql.catalyst.expressions.Literal(80)))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** Distributed photo-JPEG MOV fixture synthesis — [[AviSynthExpr]]'s
  * ISO-BMFF sibling: `mov_synth(id, w, h, frames[, quality_pct])` → a
  * real QuickTime container (full `stsd('jpeg')`/`stts`/`stsc`/
  * `stsz`/`stco` sample table via [[VideoCodec.encodeMovMjpeg]])
  * whose samples are real JPEGs of the SAME [[ImageCodec.synthPixel]]
  * noise and frame salting as `avi_synth` — so a fixture can pair the
  * same content across BOTH containers (the re-containered-copy shape
  * crawls carry). Fixture machinery; decode correctness is gated by
  * m10's constant-gray oracle. */
case class MovSynthExpr(id: Expression, w: Expression, h: Expression,
                        nFrames: Expression, qualityPct: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuinaryExpression
  with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(id, w, h, nFrames, qualityPct)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val ok = id.dataType == LongType && w.dataType == IntegerType &&
      h.dataType == IntegerType && nFrames.dataType == IntegerType &&
      qualityPct.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"mov_synth expects (long, int, int, int, int), got " +
        s"(${id.dataType.simpleString}, ${w.dataType.simpleString}, " +
        s"${h.dataType.simpleString}, ${nFrames.dataType.simpleString}, " +
        s"${qualityPct.dataType.simpleString})")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "mov_synth"

  override def nullSafeEval(idv: Any, wv: Any, hv: Any, nv: Any,
                            qv: Any): Any = {
    val i = idv.asInstanceOf[Long]
    val ww = wv.asInstanceOf[Int]
    val hh = hv.asInstanceOf[Int]
    val n = nv.asInstanceOf[Int]
    val q = qv.asInstanceOf[Int]
    require(ww >= 1 && hh >= 1 && ww <= 4096 && hh <= 4096 &&
      n >= 1 && n <= 512 && q >= 1 && q <= 100,
      s"mov_synth: dims/frames/quality out of range ($ww x $hh x $n @ $q)")
    VideoCodec.encodeMovMjpeg(ww, hh, usecPerFrame = 40000L,
      (0 until n).map(f => AviCodec.encodeJpeg(ww, hh,
        (x, y) => ImageCodec.synthPixel(i * 1009L + f, ww, x, y),
        quality = q / 100.0f)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MovSynthExpr =
    copy(id = newChildren(0), w = newChildren(1), h = newChildren(2),
      nFrames = newChildren(3), qualityPct = newChildren(4))
}

object MovSynthExpr {
  val Name = "mov_synth"
  private[plans] val info = new ExpressionInfo(classOf[MovSynthExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 4 || children.size == 5,
      s"mov_synth expects 4 or 5 arguments (id, w, h, frames[, " +
        s"quality_pct]), got ${children.size}")
    MovSynthExpr(children(0), children(1), children(2), children(3),
      children.lift(4).getOrElse(
        org.apache.spark.sql.catalyst.expressions.Literal(80)))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** Distributed WAV fixture synthesis — the media-synth family's audio
  * member: `wav_synth(id, n)` → a real RIFF/WAVE 16-bit PCM clip of
  * `n` samples. Samples are avalanche noise
  * ([[ImageCodec.synthPixel]]'s hash, low 16 bits) for the same
  * reason the image synth is: a linear formula compresses ~5× under
  * the parquet page codec, so the on-disk bytes the MB/s is computed
  * over would understate the payload actually decoded. PCM decode
  * cost itself is content-independent (RIFF parse + sample widening).
  * Fixture machinery; decode correctness is gated by m4's oracle. */
case class WavSynthExpr(id: Expression, nSamples: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  override def left: Expression = id
  override def right: Expression = nSamples

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    if (id.dataType == LongType && nSamples.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"wav_synth expects (long, int), got (${id.dataType.simpleString}, " +
        s"${nSamples.dataType.simpleString})")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_synth"

  override protected def nullSafeEval(idv: Any, nv: Any): Any = {
    val i = idv.asInstanceOf[Long]
    val n = nv.asInstanceOf[Int]
    require(n >= 1 && n <= 16000000,
      s"wav_synth: sample count out of range ($n)")
    AudioCodec.encodeWavPcm16(Array.tabulate(n)(t =>
      (ImageCodec.synthPixel(i, 1, 0, t) & 0xFFFF).toShort))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): WavSynthExpr = copy(id = l, nSamples = r)
}

object WavSynthExpr {
  val Name = "wav_synth"
  private[plans] val info = new ExpressionInfo(classOf[WavSynthExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 2,
      s"wav_synth expects 2 arguments (id, n), got ${children.size}")
    WavSynthExpr(children(0), children(1))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** RIFF/AVI container walking shared by the expression (parse) and the
  * fixture/test builders (a minimal-but-genuine MJPEG-AVI writer —
  * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
  * 00dc…))`, the byte layout any MJPEG muxer emits for these fields).
  * Facts used (the RIFF/AVI spec, a.k.a. the OpenDML layout):
  *  - a chunk is [fourcc][size:u32 LITTLE-endian][payload], padded to
  *    an even boundary (RIFF is word-aligned — the parser must advance
  *    `size + (size & 1)`);
  *  - `LIST` chunks nest: their payload leads with a list-type fourcc;
  *  - `avih` (56 bytes) carries µs-per-frame at offset 0, total frames
  *    at 16, width/height at 32/36;
  *  - video frame chunks inside `LIST 'movi'` are `##dc` (compressed)
  *    or `##db` (uncompressed) with `##` the stream number; MJPEG
  *    frame payloads are standalone JPEGs. Frames may also sit one
  *    level deeper inside `LIST 'rec '` groups. */
object AviCodec {

  final case class Meta(width: Int, height: Int, usecPerFrame: Long,
                        totalFrames: Int) {
    def durationMs: Long = totalFrames * usecPerFrame / 1000L
  }

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  private def isRiffAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI "

  /** Container metadata from the `avih` main header, or null when the
    * bytes are not a parseable AVI. */
  def meta(bytes: Array[Byte]): Meta = {
    var out: Meta = null
    if (!walk(bytes, onAvih = m => out = m, onFrame = null)) return null
    out
  }

  /** The MJPEG frame payloads (each a standalone JPEG) in stream
    * order, or null when the bytes are not a parseable AVI. */
  def frames(bytes: Array[Byte]): Array[Array[Byte]] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    if (!walk(bytes, onAvih = null, onFrame = f => acc += f)) return null
    acc.toArray
  }

  /** One chunk walk serving both probes; returns false on non-AVI or a
    * malformed chunk chain (a size that escapes its window). */
  private def walk(bytes: Array[Byte], onAvih: Meta => Unit,
                   onFrame: Array[Byte] => Unit): Boolean = {
    if (!isRiffAvi(bytes)) return false
    val fileEnd = math.min(bytes.length.toLong, 8L + u32le(bytes, 4)).toInt
    var sawAvih = false

    def chunks(start: Int, end: Int, inMovi: Boolean): Boolean = {
      var p = start
      while (p + 8 <= end) {
        val id = fourcc(bytes, p)
        val size = u32le(bytes, p + 4)
        val payload = p + 8
        if (size < 0 || payload + size > end) return false
        val payloadEnd = (payload + size).toInt
        if (id == "LIST") {
          if (size < 4) return false
          val listType = fourcc(bytes, payload)
          // 'movi' holds the frame stream; 'rec ' groups nest inside
          // it; every other list ('hdrl', 'strl', odml …) is walked for
          // headers only.
          if (!chunks(payload + 4, payloadEnd,
            inMovi || listType == "movi")) return false
        } else if (id == "avih") {
          if (size < 40) return false
          sawAvih = true
          if (onAvih != null) onAvih(Meta(
            width = u32le(bytes, payload + 32).toInt,
            height = u32le(bytes, payload + 36).toInt,
            usecPerFrame = u32le(bytes, payload),
            totalFrames = u32le(bytes, payload + 16).toInt))
        } else if (inMovi && id.length == 4 &&
          id(0).isDigit && id(1).isDigit &&
          (id.endsWith("dc") || id.endsWith("db"))) {
          if (onFrame != null)
            onFrame(java.util.Arrays.copyOfRange(bytes, payload, payloadEnd))
        }
        // Word alignment: chunks pad odd sizes with one byte.
        p = payloadEnd + (size & 1L).toInt
      }
      true
    }

    chunks(12, fileEnd, inMovi = false) && sawAvih
  }

  /** A minimal genuine MJPEG-AVI: main + stream headers and one `00dc`
    * chunk per JPEG frame — the byte layout any MJPEG muxer writes for
    * these fields. Fixture/test builder only (the decode under test
    * runs distributed on the encoded output). */
  def encodeAviMjpeg(width: Int, height: Int, usecPerFrame: Long,
                     jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    def le(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte)
        else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le(payload.length) ++ payload ++ pad
    }
    def list(typ: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ children)

    val avih = chunk("avih",
      le(usecPerFrame) ++ le(0) ++ le(0) ++ le(0) ++ // µs/frame, maxBps, pad, flags
        le(jpegFrames.size) ++ le(0) ++ le(1) ++ le(0) ++ // total, initial, streams, sugBuf
        le(width) ++ le(height) ++ le(0) ++ le(0) ++ le(0) ++ le(0))
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
        le(0) ++ le(0) ++ le(0) ++ // flags, prio+lang, initialFrames
        le(usecPerFrame) ++ le(1000000L) ++ // scale, rate (rate/scale = fps)
        le(0) ++ le(jpegFrames.size) ++ le(0) ++ le(0) ++ le(0) ++ // start, length, sugBuf, quality, sampleSize
        le(0) ++ le(0)) // rcFrame
    val strf = chunk("strf",
      le(40) ++ le(width) ++ le(height) ++
        Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++ // planes u16, bitcount u16
        "MJPG".getBytes("US-ASCII") ++
        le(width.toLong * height * 3) ++ le(0) ++ le(0) ++ le(0) ++ le(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      jpegFrames.toArray.flatMap(f => chunk("00dc", f)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le(body.length) ++ body
  }

  /** Encode a W×H RGB image as real JPEG bytes at the given quality;
    * `pixel(x, y)` returns the packed 0xRRGGBB int. JPEG is LOSSY, so
    * unlike [[ImageCodec.encodePng]] a decode does NOT generally give
    * these pixels back — EXCEPT for the constant-GRAY subset: at
    * quality 1.0 a frame whose every pixel is (v, v, v) round-trips
    * bit-exactly (Cb=Cr=128 exactly for gray, the DCT of a constant
    * block is its DC term alone, and the quality-1.0 quantizer is
    * lossless on it — pinned across all 256 values by MultimodalSpec).
    * The MJPEG fixtures lean on exactly that subset, keeping the
    * oracle's pixel formula exact while the decode path is the real
    * lossy-codec one. Fixture/test builder only. */
  def encodeJpeg(w: Int, h: Int, pixel: (Int, Int) => Int,
                 quality: Float = 1.0f): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, pixel(x, y))
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally {
      ios.close()
      writer.dispose()
    }
    baos.toByteArray
  }
}
