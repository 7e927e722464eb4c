package graft.plans

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** REAL image decode for the multimodal pipeline, on the JDK's own
  * codec (`javax.imageio` — PNG/JPEG/BMP/GIF, headless, no external
  * libraries): payload bytes → pixel grid → fixed-dim features by
  * channel-mean pooling over a `grid`×`grid` cell split. One scalar
  * expression so the decode runs inside the scan projection —
  * embarrassingly parallel, no shuffle, the shape a 100 TB media
  * corpus needs (ref: the conversion layer decodes real formats
  * wall-to-wall, e.g. conversions.py:132-210).
  *
  * Output: array<double> of length `grid*grid*3`, position
  * `(cy*grid + cx)*3 + c` holding the mean of channel `c` (0=R, 1=G,
  * 2=B, sRGB) over the pixels whose cell is `(cx, cy)` with
  * `cx = x*grid div W`, `cy = y*grid div H`, scaled to [0, 1] by /255.
  * The cell split handles any W×H (cells just differ by ±1 pixel when
  * the grid doesn't divide the dims), so variable-size media pool to
  * one fixed embedding dimension without a resize pass.
  *
  * Undecodable or truncated payloads yield NULL, not an exception: a
  * crawl-scale media corpus always carries corrupt files, and the
  * pipeline drops them with a filter instead of dying mid-job.
  *
  * Registered as `image_mean_pool(content, grid)` (grid literal).
  * CodegenFallback: one eval per IMAGE — the decode inside dominates;
  * per-row fallback overhead is noise at that granularity. */
case class ImageMeanPoolExpr(child: Expression, grid: Int)
  extends UnaryExpression with CodegenFallback {

  require(grid >= 1, s"image_mean_pool: grid must be >= 1, got $grid")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"image_mean_pool expects binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "image_mean_pool"

  override protected def nullSafeEval(input: Any): Any = {
    val pooled = ImageCodec.decodeMeanPool(input.asInstanceOf[Array[Byte]], grid)
    if (pooled == null) null else new GenericArrayData(pooled)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ImageMeanPoolExpr = copy(child = newChild)
}

object ImageMeanPoolExpr {
  val Name = "image_mean_pool"
  private[plans] val info = new ExpressionInfo(classOf[ImageMeanPoolExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 2,
      s"image_mean_pool expects 2 arguments (content, grid), got ${children.size}")
    require(children(1).foldable,
      s"image_mean_pool: grid must be a literal, got ${children(1)}")
    ImageMeanPoolExpr(children(0),
      children(1).eval(null).asInstanceOf[Number].intValue())
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** Real image METADATA probe: `image_dims(content)` → struct(width,
  * height), NULL for undecodable bytes — fills the media schema's
  * width/height from the actual payload (binary-file ingest has no
  * dims; a resize/filter stage needs them). Header-only cost for the
  * common formats: ImageIO readers expose dimensions without decoding
  * the pixel payload. */
case class ImageDimsExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"image_dims expects binary, got ${child.dataType.simpleString}")

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("width",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("height",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "image_dims"

  override protected def nullSafeEval(input: Any): Any = {
    val dims = ImageCodec.dims(input.asInstanceOf[Array[Byte]])
    if (dims == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](dims(0), dims(1)))
  }

  override protected def withNewChildInternal(
      newChild: Expression): ImageDimsExpr = copy(child = newChild)
}

object ImageDimsExpr {
  val Name = "image_dims"
  private[plans] val info = new ExpressionInfo(classOf[ImageDimsExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 1,
      s"image_dims expects 1 argument (content), got ${children.size}")
    ImageDimsExpr(children(0))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** Distributed PNG fixture synthesis: `png_synth(id, w, h)` → real
  * encoded PNG bytes whose packed RGB pixel at (x, y) is
  * [[ImageCodec.synthPixel]] — a splitmix64-style avalanche of
  * (id, y·w + x), i.e. genuinely incompressible noise. The r15 linear
  * formula (`id·73 + pos·97 + c·31 mod 256`) produced constant
  * per-pixel deltas that PNG's Sub/Paeth filters collapsed to ~124 B
  * files regardless of dims, so every decode-throughput number was
  * measured on pathological best-case inputs; hash noise restores
  * crawl-honest encoded sizes (~3 B/px PNG). A scan-projection
  * expression so corpus-scale media fixtures (hundreds of thousands of
  * images for decode-throughput benching) are generated in parallel on
  * executors instead of one by one on the driver. Fixture machinery,
  * not an operator: production media arrives as real files. */
case class PngSynthExpr(id: Expression, w: Expression, h: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with CodegenFallback {

  override def first: Expression = id
  override def second: Expression = w
  override def third: Expression = h

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val ok = id.dataType == LongType &&
      w.dataType == IntegerType && h.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"png_synth expects (long, int, int), got (${id.dataType.simpleString}, " +
        s"${w.dataType.simpleString}, ${h.dataType.simpleString})")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_synth"

  override protected def nullSafeEval(idv: Any, wv: Any, hv: Any): Any = {
    val i = idv.asInstanceOf[Long]
    val ww = wv.asInstanceOf[Int]
    val hh = hv.asInstanceOf[Int]
    require(ww >= 1 && hh >= 1 && ww <= 4096 && hh <= 4096,
      s"png_synth: dims out of range ($ww x $hh)")
    ImageCodec.encodePng(ww, hh,
      (x, y) => ImageCodec.synthPixel(i, ww, x, y))
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PngSynthExpr =
    copy(id = f, w = s, h = t)
}

object PngSynthExpr {
  val Name = "png_synth"
  private[plans] val info = new ExpressionInfo(classOf[PngSynthExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 3,
      s"png_synth expects 3 arguments (id, w, h), got ${children.size}")
    PngSynthExpr(children(0), children(1), children(2))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** Distributed JPEG fixture synthesis — [[PngSynthExpr]]'s lossy
  * sibling for decode-THROUGHPUT benching at crawl-realistic sizes:
  * `jpeg_synth(id, w, h)` → real encoded JPEG bytes (JDK codec,
  * quality 0.8) of the same pseudo-noise pixel formula. Noise is the
  * decode-cost-honest content (no codec shortcuts on flat regions) and
  * JPEG is lossy, so unlike `png_synth` there is NO exact pixel oracle
  * — correctness of the decoder is gated elsewhere (m1/m6); this
  * expression only feeds the MB/s measurement. Fixture machinery, not
  * an operator. */
case class JpegSynthExpr(id: Expression, w: Expression, h: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with CodegenFallback {

  override def first: Expression = id
  override def second: Expression = w
  override def third: Expression = h

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val ok = id.dataType == LongType &&
      w.dataType == IntegerType && h.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jpeg_synth expects (long, int, int), got (${id.dataType.simpleString}, " +
        s"${w.dataType.simpleString}, ${h.dataType.simpleString})")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "jpeg_synth"

  override protected def nullSafeEval(idv: Any, wv: Any, hv: Any): Any = {
    val i = idv.asInstanceOf[Long]
    val ww = wv.asInstanceOf[Int]
    val hh = hv.asInstanceOf[Int]
    require(ww >= 1 && hh >= 1 && ww <= 4096 && hh <= 4096,
      s"jpeg_synth: dims out of range ($ww x $hh)")
    AviCodec.encodeJpeg(ww, hh,
      (x, y) => ImageCodec.synthPixel(i, ww, x, y), quality = 0.8f)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): JpegSynthExpr =
    copy(id = f, w = s, h = t)
}

object JpegSynthExpr {
  val Name = "jpeg_synth"
  private[plans] val info = new ExpressionInfo(classOf[JpegSynthExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 3,
      s"jpeg_synth expects 3 arguments (id, w, h), got ${children.size}")
    JpegSynthExpr(children(0), children(1), children(2))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** The static codec surface shared by the expression (decode) and the
  * fixture/test builders (encode). Pure `javax.imageio` — present in
  * every JDK, works headless. */
object ImageCodec {

  // ImageIO's default stream cache is a TEMP FILE per read/write — for
  // a corpus of small in-memory payloads that is a file create+delete
  // per image and it dominates decode time at 320 K images/scan
  // (measured 9x). Heap-backed caching instead — but this is a
  // JVM-WIDE setting that also affects co-tenant ImageIO users in the
  // same executor process (they lose disk-backed buffering of large
  // non-seekable streams), so a deployment sharing executors with such
  // code can opt out with -Dgraft.imageio.cache=keep; graft itself
  // only ever feeds ImageIO in-heap byte arrays, for which the temp
  // file is pure overhead.
  if (!sys.props.get("graft.imageio.cache").contains("keep"))
    javax.imageio.ImageIO.setUseCache(false)

  /** Decode + channel-mean pool; null when the bytes are not a
    * decodable image. Sums are exact integer accumulations, so the
    * result is deterministic: `sum / count / 255.0` per cell-channel,
    * reproducible bit-for-bit by any engine replaying the same
    * bucketing over the ground-truth pixels.
    *
    * Plain 8-bit truecolor non-interlaced PNGs (the dominant crawl
    * shape, and what every fixture writer emits) take a direct
    * inflate+unfilter fast path that pools raw scanline bytes without
    * building a BufferedImage — measured 2.7x over ImageIO on
    * 128-512 px RGB, bit-identical sums (the raw samples ARE the sRGB
    * values getRGB returns for this shape; MediaCodecProps pins the
    * equality). Any other chunk set, depth, color type, or a JPEG
    * falls through to the ImageIO path unchanged. */
  def decodeMeanPool(bytes: Array[Byte], grid: Int): Array[Double] = {
    // Totality guard mirroring the WAV path (AudioExpr.openPcm16): a
    // malformed container that slips past the structural checks must
    // fall back to ImageIO, never crash the task.
    val fast =
      try pngRawRgb(bytes)
      catch { case scala.util.control.NonFatal(_) => null }
    if (fast != null)
      return poolRawRgb(fast.w, fast.h, fast.channels, fast.rows, grid)
    // Measured and rejected (r20): a JPEG sibling of the PNG fast path
    // (baseline Huffman + libjpeg islow IDCT + fancy upsampling +
    // integer YCbCr→RGB in pure JVM, bit-exact vs ImageIO on a
    // 228-case pixel-identity pin). Same-window A-B-A heavy min-of-3:
    // m7 7.95 → 6.63 → 7.48 s, m8 4.47 → 4.06, m14 15.36 → 11.47 —
    // the JVM port LOSES 15-30% to the ImageIO path, because this
    // JDK's JPEG plugin delegates to the system libjpeg-turbo whose
    // SIMD IDCT/upsample/color kernels a scalar JVM loop cannot match
    // (the PNG win was Java-vs-Java; JPEG is Java-vs-native). Keep
    // ImageIO for JPEG; revisit only if a deployment JRE loses the
    // native codec.
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return null
    val cells = grid * grid
    val sums = new Array[Long](cells * 3)
    val cnts = new Array[Long](cells)
    // Row-batched pixel access: getRGB(x, y) per pixel costs a virtual
    // raster lookup + color-model conversion PER CALL and dominated the
    // pooling at crawl-size images (measured on the m7 fixture); the
    // bulk overload converts a whole row per call with identical sRGB
    // semantics.
    val rowBuf = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      val cy = y * grid / h
      var x = 0
      while (x < w) {
        val cx = x * grid / w
        val cell = cy * grid + cx
        val rgb = rowBuf(x) // sRGB, alpha premultiplication none
        sums(cell * 3) += (rgb >>> 16) & 0xFF
        sums(cell * 3 + 1) += (rgb >>> 8) & 0xFF
        sums(cell * 3 + 2) += rgb & 0xFF
        cnts(cell) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Double](cells * 3)
    var i = 0
    while (i < cells * 3) {
      val n = cnts(i / 3)
      // A cell is empty only when grid > min(w, h); its features are 0.
      out(i) = if (n == 0) 0.0 else sums(i).toDouble / n / 255.0
      i += 1
    }
    out
  }

  /** Unfiltered scanlines of a plain 8-bit truecolor PNG. */
  private[plans] final case class RawPng(w: Int, h: Int, channels: Int,
                                         rows: Array[Byte])

  /** The PNG fast-path parser: 8-bit color-type-2 (truecolor RGB)
    * non-interlaced, with a conservative chunk whitelist — any chunk
    * that could alter decoded sample values (PLTE, tRNS, gAMA, sRGB,
    * cHRM, iCCP, sBIT, or anything unknown) returns null so the caller
    * falls back to ImageIO, as does any structural defect. Inflate +
    * per-row unfilter (types 0-4 per the PNG spec) into packed RGB
    * scanlines. */
  private[plans] def pngRawRgb(bytes: Array[Byte]): RawPng = {
    if (bytes.length < 45) return null
    def u32(o: Int): Int =
      ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
        ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)
    if (u32(0) != 0x89504E47 || u32(4) != 0x0D0A1A0A) return null
    var off = 8
    var w = 0; var h = 0; var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream(bytes.length)
    var ended = false
    while (!ended) {
      if (off + 12 > bytes.length) return null // truncated chunk frame
      val len = u32(off)
      val typ = u32(off + 4)
      // Overflow-safe bound: `off + 12 + len > bytes.length` wraps
      // negative for len near Int.MaxValue and would let a crafted
      // chunk length through to idat.write. The subtraction form
      // cannot overflow (off + 12 <= bytes.length is established
      // above, so the RHS is >= 0).
      if (len < 0 || len > bytes.length - off - 12) return null
      typ match {
        case 0x49484452 => // IHDR
          if (len < 13) return null
          w = u32(off + 8); h = u32(off + 12)
          val depth = bytes(off + 16) & 0xFF
          val ctype = bytes(off + 17) & 0xFF
          val interlace = bytes(off + 20) & 0xFF
          if (depth != 8 || ctype != 2 || interlace != 0) return null
          seenIhdr = true
        case 0x49444154 => idat.write(bytes, off + 8, len) // IDAT
        case 0x49454E44 => ended = true // IEND
        // Ancillary chunks that cannot change sample values.
        case 0x74455874 | 0x7A545874 | 0x69545874 // tEXt zTXt iTXt
           | 0x74494D45 | 0x70485973 | 0x624B4744 => () // tIME pHYs bKGD
        case _ => return null
      }
      off += 12 + len
    }
    if (!seenIhdr || w <= 0 || h <= 0 ||
        w.toLong * h > (1L << 28)) return null
    val stride = w * 3
    val filtered = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (!inf.finished() && got < filtered.length) {
        val n = inf.inflate(filtered, got, filtered.length - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return null
        got += n
      }
      if (got < filtered.length) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val f = filtered((stride + 1) * y) & 0xFF
      val src = (stride + 1) * y + 1
      val dst = stride * y
      var i = 0
      f match {
        case 0 => System.arraycopy(filtered, src, out, dst, stride)
        case 1 => // Sub
          while (i < stride) {
            val a = if (i >= 3) out(dst + i - 3) & 0xFF else 0
            out(dst + i) = ((filtered(src + i) & 0xFF) + a).toByte
            i += 1
          }
        case 2 => // Up
          while (i < stride) {
            val b = if (y > 0) out(dst - stride + i) & 0xFF else 0
            out(dst + i) = ((filtered(src + i) & 0xFF) + b).toByte
            i += 1
          }
        case 3 => // Average
          while (i < stride) {
            val a = if (i >= 3) out(dst + i - 3) & 0xFF else 0
            val b = if (y > 0) out(dst - stride + i) & 0xFF else 0
            out(dst + i) = ((filtered(src + i) & 0xFF) + ((a + b) >> 1)).toByte
            i += 1
          }
        case 4 => // Paeth
          while (i < stride) {
            val a = if (i >= 3) out(dst + i - 3) & 0xFF else 0
            val b = if (y > 0) out(dst - stride + i) & 0xFF else 0
            val c = if (y > 0 && i >= 3) out(dst - stride + i - 3) & 0xFF else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            out(dst + i) = ((filtered(src + i) & 0xFF) + pred).toByte
            i += 1
          }
        case _ => return null
      }
      y += 1
    }
    RawPng(w, h, 3, out)
  }

  /** The decodeMeanPool pooling loop over raw packed scanlines — same
    * integer accumulation, same cell bucketing, no BufferedImage. */
  private def poolRawRgb(w: Int, h: Int, ch: Int, data: Array[Byte],
                         grid: Int): Array[Double] = {
    val cells = grid * grid
    val sums = new Array[Long](cells * 3)
    val cnts = new Array[Long](cells)
    var y = 0
    while (y < h) {
      val cy = y * grid / h
      val row = y * w * ch
      var x = 0
      while (x < w) {
        val cell = cy * grid + x * grid / w
        val o = row + x * ch
        sums(cell * 3) += data(o) & 0xFF
        sums(cell * 3 + 1) += data(o + 1) & 0xFF
        sums(cell * 3 + 2) += data(o + 2) & 0xFF
        cnts(cell) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Double](cells * 3)
    var i = 0
    while (i < cells * 3) {
      val n = cnts(i / 3)
      out(i) = if (n == 0) 0.0 else sums(i).toDouble / n / 255.0
      i += 1
    }
    out
  }

  /** The synth expressions' shared pixel formula: a splitmix64-style
    * avalanche of (id, y·w + x) packed as 0xRRGGBB — deterministic,
    * per-pixel independent, genuinely incompressible (so synthesized
    * fixtures carry crawl-honest encoded sizes, not filter-collapsed
    * best cases). */
  def synthPixel(id: Long, w: Int, x: Int, y: Int): Int = {
    var z = id * 0x9E3779B97F4A7C15L + (y.toLong * w + x) * 0xBF58476D1CE4E5B9L
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^= z >>> 31
    (z & 0xFFFFFF).toInt
  }

  /** (width, height) from the image HEADER (no pixel decode), or null
    * when the bytes carry no readable image. */
  def dims(bytes: Array[Byte]): Array[Int] = {
    val in =
      try javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (in == null) return null
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) return null
      val r = readers.next()
      try {
        r.setInput(in)
        Array(r.getWidth(0), r.getHeight(0))
      } catch {
        case _: java.io.IOException | _: IndexOutOfBoundsException => null
      } finally r.dispose()
    } finally in.close()
  }

  /** Encode a W×H RGB image as real PNG bytes; `pixel(x, y)` returns
    * the packed 0xRRGGBB int. PNG is lossless RGB, so a decode gives
    * back exactly these pixels — the property the fixture oracles
    * lean on. Fixture/test builder only (driver-side, bounded). */
  def encodePng(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
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
    val baos = new ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "png", baos))
      throw new IllegalStateException(
        "ImageCodec.encodePng: no PNG writer in this JRE (javax.imageio " +
          "ships one in every standard JDK)")
    baos.toByteArray
  }
}
