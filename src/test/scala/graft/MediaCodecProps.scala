package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.plans.{AviCodec, ImageCodec, VideoCodec}

/** ScalaCheck properties for the media container parsers: crawl
  * corpora feed them arbitrary bytes, so the contract is total —
  * parse or return null, NEVER throw or hang — and round-trips
  * through the test muxers must be exact under randomized container
  * parameters (frame counts, chunking, offset-table width) the
  * fixed-edge spec cases can't enumerate. */
object MediaCodecProps extends Properties("MediaCodec") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(40)

  private def jpeg(gray: Int, w: Int = 16, h: Int = 16): Array[Byte] =
    AviCodec.encodeJpeg(w, h, (_, _) => (gray << 16) | (gray << 8) | gray)

  private val frameSet: Gen[Seq[Array[Byte]]] = for {
    n <- Gen.chooseNum(1, 9)
    grays <- Gen.listOfN(n, Gen.chooseNum(0, 255))
  } yield grays.map(jpeg(_))

  property("MOV round-trip is exact under random chunking and offset width") =
    Prop.forAll(frameSet, Gen.chooseNum(0, 4), Gen.oneOf(true, false)) {
      (frames, spc, co64) =>
        val mov = VideoCodec.encodeMovMjpeg(16, 16, 40000L, frames,
          samplesPerChunk = spc, useCo64 = co64)
        val got = VideoCodec.framesJpeg(mov)
        got != null && got.toSeq.map(_.toSeq) == frames.map(_.toSeq)
    }

  property("AVI round-trip is exact under random frame counts") =
    Prop.forAll(frameSet) { frames =>
      val avi = AviCodec.encodeAviMjpeg(16, 16, 40000L, frames)
      val got = AviCodec.frames(avi)
      got != null && got.toSeq.map(_.toSeq) == frames.map(_.toSeq)
    }

  // Totality on garbage: arbitrary byte blobs — including ones that
  // lead with valid-looking magic — parse to null or a value, never
  // throw. (Hangs would trip ScalaCheck's own run budget.)
  private val junk: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 512)
    lead <- Gen.oneOf("", "RIFF", "RIFFxxxxAVI ",
      "\u0000\u0000\u0000\u0014ftyp", "\u0000\u0000\u0000\u0008moov")
    body <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  } yield lead.getBytes("ISO-8859-1") ++ body.map(_.toByte)

  property("parsers are total on arbitrary bytes") =
    Prop.forAll(junk) { bytes =>
      VideoCodec.framesJpeg(bytes) // null or value, must not throw
      AviCodec.frames(bytes)
      AviCodec.meta(bytes)
      VideoCodec.parseMeta(bytes)
      true
    }

  // Totality under single-byte corruption of a VALID container: every
  // mutation either parses (possibly to different frames) or returns
  // null — the crawl's bit-rot reality.
  private val validMov: Array[Byte] =
    VideoCodec.encodeMovMjpeg(16, 16, 40000L,
      Seq(jpeg(10), jpeg(200), jpeg(77)), samplesPerChunk = 2)
  private val validAvi: Array[Byte] =
    AviCodec.encodeAviMjpeg(16, 16, 40000L, Seq(jpeg(10), jpeg(200)))

  property("single-byte corruption never crashes either walk") =
    Prop.forAll(Gen.chooseNum(0, validMov.length - 1),
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue)) { (pos, b) =>
      val m = validMov.clone(); m(pos) = b.toByte
      VideoCodec.framesJpeg(m)
      VideoCodec.parseMeta(m)
      val a = validAvi.clone()
      a(pos % a.length) = b.toByte
      AviCodec.frames(a)
      AviCodec.meta(a)
      true
    }

  // Truncation at every length: same totality contract.
  property("every prefix truncation parses to null-or-fewer, never throws") =
    Prop.forAll(Gen.chooseNum(0, validMov.length)) { len =>
      VideoCodec.framesJpeg(java.util.Arrays.copyOf(validMov, len))
      AviCodec.frames(java.util.Arrays.copyOf(validAvi,
        math.min(len, validAvi.length)))
      true
    }

  // The recursion bound: a crafted chain of thousands of self-nested
  // 8-byte boxes (well under 100 KB of payload) must parse to null,
  // not recurse into StackOverflowError — an Error nothing in a Spark
  // task catches, so without the depth cap this input kills the task
  // and violates the parse-or-null totality contract. The junk
  // generator above maxes at 512 bytes and cannot observe this.
  property("deeply self-nested box chains parse to null, never overflow") =
    Prop.forAll(Gen.chooseNum(2000, 12000)) { depth =>
      def bomb(inner: String): Array[Byte] = {
        val total = 8 * (depth + 2)
        val buf = java.nio.ByteBuffer.allocate(total)
        def put(size: Int, typ: String): Unit = {
          buf.putInt(size); buf.put(typ.getBytes("US-ASCII")); ()
        }
        put(total, "moov")
        put(total - 8, "trak")
        var rem = total - 16
        while (rem >= 8) { put(rem, inner); rem -= 8 }
        buf.array()
      }
      // parseMeta recurses on nested trak; framesJpeg on mdia/minf/stbl
      // under a trak — exercise both walks' recursive cases. The
      // non-recursive nestings (mdia under parseMeta, trak-in-trak
      // under framesJpeg) are skipped-whole and only need totality.
      VideoCodec.parseMeta(bomb("trak")) == null &&
        VideoCodec.framesJpeg(bomb("mdia")) == null &&
        VideoCodec.framesJpeg(bomb("trak")) == null &&
        { VideoCodec.parseMeta(bomb("mdia")); true }
    }

  // The audio decoders share the contract: junk, corruption, and
  // truncation of a valid WAV parse to null or a value, never throw;
  // and stats/pooling agree on validity (both null or both present).
  private val validWav: Array[Byte] = graft.plans.AudioCodec
    .encodeWavPcm16(Array.tabulate(300)(t => ((t * 131) % 4001 - 2000).toShort))

  property("audio decoders are total and agree on validity") =
    Prop.forAll(junk, Gen.chooseNum(0, validWav.length - 1),
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue)) { (bytes, pos, b) =>
      import graft.plans.AudioCodec
      (AudioCodec.decodeStats(bytes) == null) ==
        (AudioCodec.decodeMeanPool(bytes, 4) == null) && {
        val w = validWav.clone(); w(pos) = b.toByte
        AudioCodec.decodeStats(w); AudioCodec.decodeMeanPool(w, 4)
        AudioCodec.decodeStats(java.util.Arrays.copyOf(validWav, pos))
        true
      }
    }

  // The PNG fast path (inflate+unfilter, no BufferedImage) must pool
  // BIT-IDENTICALLY to the ImageIO reference on every filter type the
  // encoder can choose. Pixel patterns steer the adaptive filter
  // choice: flat images favor Up/Sub, gradients Average/Paeth, random
  // None — together they exercise all unfilter branches.
  private def imageIoPool(bytes: Array[Byte], grid: Int): Array[Double] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    val cells = grid * grid
    val sums = new Array[Long](cells * 3)
    val cnts = new Array[Long](cells)
    val rowBuf = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      val cy = y * grid / h
      var x = 0
      while (x < w) {
        val cell = cy * grid + x * grid / w
        val rgb = rowBuf(x)
        sums(cell * 3) += (rgb >>> 16) & 0xFF
        sums(cell * 3 + 1) += (rgb >>> 8) & 0xFF
        sums(cell * 3 + 2) += rgb & 0xFF
        cnts(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(cells * 3)(i =>
      if (cnts(i / 3) == 0) 0.0 else sums(i).toDouble / cnts(i / 3) / 255.0)
  }

  private val pngPattern: Gen[(Int, Int, (Int, Int) => Int)] = for {
    w <- Gen.chooseNum(1, 70)
    h <- Gen.chooseNum(1, 70)
    seed <- Gen.chooseNum(0L, 1L << 40)
    kind <- Gen.chooseNum(0, 3)
  } yield (w, h, (x: Int, y: Int) => kind match {
    case 0 => ImageCodec.synthPixel(seed, w, x, y) // incompressible
    case 1 => 0x334455 // flat
    case 2 => ((x * 3) & 0xFF) << 16 | ((x * 5) & 0xFF) << 8 | (x & 0xFF)
    case _ => ((y * 7) & 0xFF) << 16 | (((x + y) * 2) & 0xFF) << 8 | (y & 0xFF)
  })

  property("PNG fast-path pooling bit-equals the ImageIO reference") =
    Prop.forAll(pngPattern, Gen.chooseNum(1, 5)) { case ((w, h, px), grid) =>
      val png = ImageCodec.encodePng(w, h, px)
      val fast = ImageCodec.decodeMeanPool(png, grid)
      val ref = imageIoPool(png, grid)
      fast != null && fast.sameElements(ref)
    }

  // The WAV fast path (direct RIFF walk, no javax.sound) must decode
  // encodeWavPcm16's canonical bytes LOSSLESSLY: stats and pooling
  // reproduce the ground-truth samples' exact integer accumulations.
  property("WAV fast-path decode is lossless against the sample formula") =
    Prop.forAll(Gen.chooseNum(1, 2000), Gen.chooseNum(0L, 1L << 30),
      Gen.chooseNum(1, 8)) { (n, seed, dim) =>
      import graft.plans.AudioCodec
      val samples = Array.tabulate(n)(t =>
        (((seed + t * 131) % 4001) - 2000).toShort)
      val wav = AudioCodec.encodeWavPcm16(samples)
      val st = AudioCodec.decodeStats(wav)
      var peak = 0L; var sq = 0L; var zc = 0L
      var prev = 0
      samples.zipWithIndex.foreach { case (s, i) =>
        peak = math.max(peak, math.abs(s.toLong)); sq += s.toLong * s
        if (i > 0 && prev.toLong * s < 0) zc += 1
        prev = s
      }
      val pool = AudioCodec.decodeMeanPool(wav, dim)
      val expect = Array.tabulate(dim) { b =>
        val start = ((b.toLong * n + dim - 1) / dim).toInt
        val end = (((b + 1).toLong * n + dim - 1) / dim).toInt
        if (end == start) 0.0
        else samples.slice(start, end).map(_.toLong).sum.toDouble /
          (end - start) / 32768.0
      }
      st.sameElements(Array(n.toLong, peak, sq, zc)) &&
        pool.sameElements(expect)
    }

  property("PNG fast path is total: junk, truncation, corruption") =
    Prop.forAll(junk, Gen.chooseNum(0, 1000),
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue)) { (bytes, pos, b) =>
      ImageCodec.decodeMeanPool(bytes, 4) // null or value, never throws
      val png = ImageCodec.encodePng(9, 7, (x, y) => (x * 31 + y) & 0xFFFFFF)
      val p = pos % png.length
      val m = png.clone(); m(p) = b.toByte
      ImageCodec.decodeMeanPool(m, 4)
      ImageCodec.decodeMeanPool(java.util.Arrays.copyOf(png, p), 4)
      true
    }
}
