package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Multimodal

/** Multimodal plumbing: schema contract, deterministic stub decode,
  * frame-sampling shape (no payload replication). */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def media = Seq(
    (1L, "imagebytes-aaaa", "image/png", 4, 4, null.asInstanceOf[java.lang.Long]),
    (2L, "videobytes-bbbb", "video/mp4", 16, 9, java.lang.Long.valueOf(2500L)))
    .toDF("media_id", "payload", "mime", "w", "h", "dur")
    .select(col("media_id"), col("payload").cast("binary").as("content"),
      struct(col("mime").as("mime"), col("w").as("width"),
             col("h").as("height"), col("dur").as("duration_ms")).as("meta"))

  test("binaryFile wrap derives mime from path") {
    val files = Seq(("/data/a.png", "x"), ("/data/b.mp4", "y"), ("/data/c.bin", "z"))
      .toDF("path", "payload")
      .withColumn("content", col("payload").cast("binary"))
    val m = Multimodal.fromBinaryFiles(files)
    assert(m.schema.fieldNames.toSeq == Seq("media_id", "content", "meta"))
    val mimes = m.select("meta.mime").as[String].collect().toSet
    assert(mimes == Set("image/png", "video/mp4", "application/octet-stream"))
  }

  test("stub feature extraction is deterministic and fixed-dim") {
    val f1 = Multimodal.extractFeatures(media, dim = 8)
      .select("features").as[Seq[Double]].collect()
    val f2 = Multimodal.extractFeatures(media, dim = 8)
      .select("features").as[Seq[Double]].collect()
    assert(f1.map(_.toSeq).toSeq == f2.map(_.toSeq).toSeq)
    assert(f1.forall(_.size == 8))
    assert(f1.forall(_.forall(v => v >= -1.0 && v <= 1.0)))
    // Different payloads → different features.
    assert(f1(0) != f1(1))
  }

  test("resize rewrites metadata only") {
    val r = Multimodal.resize(media, 224, 224)
    val dims = r.select("meta.width", "meta.height").as[(Int, Int)].collect().toSet
    assert(dims == Set((224, 224)))
    // Payload untouched.
    assert(r.select(length(col("content"))).as[Int].collect().toSet
      == media.select(length(col("content"))).as[Int].collect().toSet)
  }

  test("frame sampling explodes duration without replicating payload") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000)
    // Only the video row; 2500 ms at 1000 ms → frames at 0,1000,2000.
    assert(frames.select("frame_ms").as[Long].collect().sorted.toSeq
      == Seq(0L, 1000L, 2000L))
    assert(!frames.columns.contains("content"))
    assert(frames.select("frame_id").distinct().count() == 3)
  }

  test("decoder swap contract: a different decoder drops in through the seam; downstream is decoder-agnostic") {
    import org.apache.spark.sql.Column
    // A fake codec with deliberately DIFFERENT byte→feature behavior
    // than the stub (payload-length harmonics instead of payload-hash
    // buckets) — standing in for the real image decoder a deployment
    // injects. Same contract: (payload, dim) → array<double>.
    val fakeCodec: (Column, Int) => Column = (content, dim) =>
      transform(sequence(lit(0), lit(dim - 1)),
        i => pmod(length(content) * (i + 1), lit(17)).cast("double") / 8.5 - 1.0)

    val corpus = Tables.documents(spark, TestSpark.Sf)
      .filter(col("doc_id") < 150)
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("content"),
        struct(lit("image/png").as("mime"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta"))

    // pipe23's downstream (extract → exact near-dup pairing), run once
    // per decoder: the pipeline around the seam must not change...
    def pairsWith(dec: (Column, Int) => Column) = {
      val feats = Multimodal.extractFeaturesWith(corpus, dim = 8, dec)
      assert(feats.schema("features").dataType.typeName == "array")
      graft.llm.Dedup.embeddingNearDupPairsExact(
          feats.select(col("media_id"), col("features")),
          "media_id", "features", 0.5)
        .as[(Long, Long, Double)].collect().toSet
    }
    val stubPairs = pairsWith(Multimodal.decodeStub _)
    val fakePairs = pairsWith(fakeCodec)
    // ...the downstream invariants hold under ANY decoder...
    for (ps <- Seq(stubPairs, fakePairs)) {
      assert(ps.nonEmpty, "vacuous fixture: no near-dup pairs")
      assert(ps.forall { case (a, b, s) =>
        a < b && s >= 0.5 - 1e-9 && s <= 1.0 + 1e-9 })
    }
    // ...and the decoder actually flows through: swapping it changes
    // WHAT is embedded (a swap that leaves every pair identical would
    // mean the seam is dead code).
    assert(stubPairs != fakePairs)
  }

  test("real image decode: PNG round-trip pools the exact ground-truth pixels") {
    import graft.plans.ImageCodec
    // 4×2 image with hand-picked channel values; grid 2 → cells are
    // the left 2×2 and right 2×2 halves (h=2 < grid rows? no: cy =
    // y*2/2 ∈ {0,1}, cx = x*2/4 ∈ {0,1} — four 2×1 cells).
    def px(x: Int, y: Int): Int = {
      val r = 10 * (y * 4 + x); val g = r + 1; val b = r + 2
      (r << 16) | (g << 8) | b
    }
    val bytes = ImageCodec.encodePng(4, 2, px)
    val media = Seq((1L, bytes)).toDF("media_id", "content")
    val out = Multimodal.extractFeaturesImage(media, grid = 2)
      .select("features").as[Seq[Double]].collect()(0)
    assert(out.size == 12)
    // Replay the pooling by hand from the formula pixels.
    val expect = for (cy <- 0 to 1; cx <- 0 to 1; c <- 0 to 2) yield {
      val cells = for (y <- 0 until 2; x <- 0 until 4
                       if y * 2 / 2 == cy && x * 2 / 4 == cx)
        yield (10 * (y * 4 + x) + c).toLong
      cells.sum.toDouble / cells.size / 255.0
    }
    assert(out == expect, s"\n$out\nvs\n$expect")
  }

  test("real image decode: undecodable payloads yield null, not a crash") {
    val good = graft.plans.ImageCodec.encodePng(3, 3, (_, _) => 0x804020)
    val rows = Seq(
      (1L, good),
      (2L, "definitely not a png".getBytes("UTF-8")),
      (3L, good.take(10)), // truncated header
      (4L, Array.empty[Byte]))
    val out = Multimodal.extractFeaturesImage(
        rows.toDF("media_id", "content"), grid = 1)
      .select(col("media_id"), col("features"))
      .as[(Long, Option[Seq[Double]])].collect().toMap
    assert(out(1L).isDefined && out(1L).get ==
      Seq(0x80 / 255.0, 0x40 / 255.0, 0x20 / 255.0))
    assert(out(2L).isEmpty && out(3L).isEmpty && out(4L).isEmpty)
    // The production drop: a filter removes the corrupt rows.
    assert(Multimodal.extractFeaturesImage(
        rows.toDF("media_id", "content"), grid = 1)
      .filter(col("features").isNotNull).count() == 1)
  }

  test("real image decode pools variable image sizes to one fixed dim") {
    import graft.plans.ImageCodec
    val rows = for (id <- 1L to 8L) yield {
      val w = (2 + id % 5).toInt; val h = (2 + id % 3).toInt
      (id, ImageCodec.encodePng(w, h,
        (x, y) => (((id * 7 + y * w + x) % 256).toInt) * 0x010101))
    }
    val feats = Multimodal.extractFeaturesImage(
        rows.toDF("media_id", "content"), grid = 2)
      .select("features").as[Seq[Double]].collect()
    assert(feats.forall(_.size == 12))
    assert(feats.forall(_.forall(v => v >= 0.0 && v <= 1.0)))
    // Grayscale fixture: R=G=B per pixel, so each cell's three channel
    // means agree — a channel-order bug would break this.
    assert(feats.forall(f => f.grouped(3).forall(g => g.distinct.size == 1)))
  }

  test("png_synth generates real PNGs whose decoded pooling matches the driver-side encoder bit-for-bit") {
    import org.apache.spark.sql.functions.call_function
    graft.plans.PngSynthExpr.register(spark)
    // Distributed synthesis (the heavy-fixture path) vs the driver-side
    // ImageCodec encode m1's fixtures use — same formula, and the REAL
    // decode must pool both to identical features.
    val ids = (1L to 20L).toDF("media_id")
    val viaExpr = Multimodal.extractFeaturesImage(
        ids.select(col("media_id"),
          call_function(graft.plans.PngSynthExpr.Name, col("media_id"),
            (lit(16) + pmod(col("media_id"), lit(9))).cast("int"),
            (lit(16) + pmod(col("media_id"), lit(7))).cast("int"))
            .as("content")),
        grid = 2)
      .select("media_id", "features").as[(Long, Seq[Double])]
      .collect().toMap
    val viaDriver = (1L to 20L).map { id =>
      val w = (16 + id % 9).toInt; val h = (16 + id % 7).toInt
      id -> graft.plans.ImageCodec.decodeMeanPool(
        graft.plans.ImageCodec.encodePng(w, h,
          (x, y) => graft.plans.ImageCodec.synthPixel(id, w, x, y)),
        2).toSeq
    }.toMap
    assert(viaExpr == viaDriver)
  }

  test("refreshImageMeta fills width/height from the real payload header; corrupt payloads keep nulls") {
    val png = graft.plans.ImageCodec.encodePng(7, 5, (_, _) => 0x112233)
    val rows = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "content")
      .withColumn("meta", struct(lit("image/png").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")))
    val out = Multimodal.refreshImageMeta(rows)
      .select(col("media_id"), col("meta.width"), col("meta.height"))
      .as[(Long, Option[Int], Option[Int])].collect()
      .map { case (k, w, h) => k -> ((w, h)) }.toMap
    assert(out(1L) == (Some(7), Some(5)))
    assert(out(2L) == (None, None))
    // Schema is unchanged — the stage contract resize() also keeps.
    assert(Multimodal.refreshImageMeta(rows).schema == rows.schema)
  }

  test("real audio decode: WAV round-trip pools the exact ground-truth samples; corrupt/empty yield null") {
    import graft.plans.AudioCodec
    // 10 samples, dim 4 → buckets of 3/2/3/2 (i*4 div 10).
    val samples = Array[Short](100, -200, 300, 400, -500, 600, 700, -800, 900, 1000)
    val rows = Seq(
      (1L, AudioCodec.encodeWavPcm16(samples)),
      (2L, "not audio".getBytes("UTF-8")),
      (3L, AudioCodec.encodeWavPcm16(samples).take(20)), // torn header
      (4L, Array.empty[Byte]))
    val out = Multimodal.extractFeaturesAudio(
        rows.toDF("media_id", "content"), dim = 4)
      .select(col("media_id"), col("features"))
      .as[(Long, Option[Seq[Double]])].collect().toMap
    val expect = (0 until 4).map { b =>
      val bucket = samples.indices.filter(i => i * 4 / 10 == b).map(samples(_).toLong)
      bucket.sum.toDouble / bucket.size / 32768.0
    }
    assert(out(1L).contains(expect))
    assert(out(2L).isEmpty && out(3L).isEmpty && out(4L).isEmpty)
  }

  test("real audio decode handles the big-endian (AIFF) sample path identically") {
    import graft.plans.AudioCodec
    val samples = Array.tabulate(50)(t => ((t * 313) % 4001 - 2000).toShort)
    val wav = AudioCodec.encodeWavPcm16(samples)
    // Re-container the same PCM as AIFF (big-endian) via the JDK codec
    // itself, so the expression's byte-order branch is pinned against
    // the little-endian form.
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, baos)
    val aiff = baos.toByteArray
    val rows = Seq((1L, wav), (2L, aiff)).toDF("media_id", "content")
    val out = Multimodal.extractFeaturesAudio(rows, dim = 4)
      .select(col("media_id"), col("features"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(out(1L) == out(2L))
  }

  test("audio_stats: exact integer amplitude stats, full-scale peaks, byte-order parity, corrupt nulls") {
    import graft.plans.AudioCodec
    // Samples spanning both full-scale extremes (|MinValue| = 32768 —
    // the abs that overflows Short must widen, not wrap), zeros (a
    // zero breaks a sign run: strict product < 0 means no crossing
    // through it), and ordinary values.
    val samples = Array[Short](100, -200, 0, -300, 300, Short.MaxValue,
      Short.MinValue, 5, 5, -1)
    val wav = AudioCodec.encodeWavPcm16(samples)
    val stats = AudioCodec.decodeStats(wav)
    assert(stats(0) == 10)
    assert(stats(1) == 32768, "|Short.MinValue| must not wrap")
    val expectSumSq = samples.map(s => s.toLong * s).sum
    assert(stats(2) == expectSumSq)
    // Crossings: 100→-200, -300→300, 32767→-32768, -32768→5, 5→-1 = 5
    // (0 breaks the -200→-300 run without adding crossings).
    assert(stats(3) == 5)
    // Byte-order parity: the same PCM re-containered as AIFF
    // (big-endian) reads identical stats.
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, baos)
    assert(AudioCodec.decodeStats(baos.toByteArray).toSeq == stats.toSeq)
    // Corrupt payloads: null stats through the column stage, no crash.
    val rows = Seq((1L, wav), (2L, "noise".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val out = Multimodal.audioStats(rows)
      .select(col("media_id"), col("stats.peak"),
        col("stats").isNull.as("n"))
      .as[(Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(32768L), false)))
    assert(out(2L)._2, "corrupt payload must yield null stats")
  }

  test("video_meta parses genuine ISO-BMFF boxes; corrupt/non-container payloads keep prior meta") {
    import graft.plans.VideoCodec
    val mp4 = VideoCodec.encodeMp4Skeleton(width = 640, height = 360,
      durationMs = 2500)
    // Direct parse round-trip.
    val m = VideoCodec.parseMeta(mp4)
    assert(m.width == 640 && m.height == 360 && m.durationMs == 2500)
    // Non-containers and torn headers parse to null.
    assert(VideoCodec.parseMeta("not a video".getBytes("UTF-8")) == null)
    assert(VideoCodec.parseMeta(mp4.take(12)) == null)
    // Through the metadata stage: the real duration drives the frame
    // sampler, and a non-BMFF payload keeps its existing meta.
    val rows = Seq(
      (1L, mp4, java.lang.Long.valueOf(999L)),
      (2L, "junk".getBytes("UTF-8"), java.lang.Long.valueOf(700L)))
      .toDF("media_id", "content", "dur0")
      .withColumn("meta", struct(lit("video/mp4").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        col("dur0").as("duration_ms")))
      .drop("dur0")
    val out = Multimodal.refreshVideoMeta(rows)
      .select(col("media_id"), col("meta.width"), col("meta.duration_ms"))
      .as[(Long, Option[Int], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(640), Some(2500L)))) // parsed, 999 overridden
    assert(out(2L) == ((None, Some(700L))))       // junk: meta untouched
    val frames = Multimodal.sampleFrames(
      Multimodal.refreshVideoMeta(rows), everyMs = 1000L)
    assert(frames.filter(col("media_id") === 1L)
      .select("frame_ms").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1000L, 2000L))
  }

  test("video_meta handles 64-bit largesize boxes and multi-trak max dims") {
    import graft.plans.VideoCodec
    val base = VideoCodec.encodeMp4Skeleton(640, 360, 2500)
    // Rewrite the top-level moov header to the size==1 + largesize
    // form (the layout >4 GiB muxes use): [1:u32][moov][largesize:u64].
    def u32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xFFL) << 24) | ((b(off+1) & 0xFFL) << 16) |
        ((b(off+2) & 0xFFL) << 8) | (b(off+3) & 0xFFL)
    var p = 0
    while (new String(base, p + 4, 4, "US-ASCII") != "moov")
      p += u32(base, p).toInt
    val moovSize = u32(base, p).toInt
    val out = java.nio.ByteBuffer.allocate(base.length + 8)
    out.put(base, 0, p)
    out.putInt(1).put("moov".getBytes("US-ASCII"))
      .putLong(moovSize + 8L)
    out.put(base, p + 8, moovSize - 8)
    out.put(base, p + moovSize, base.length - p - moovSize)
    val m = VideoCodec.parseMeta(out.array())
    assert(m != null && m.width == 640 && m.height == 360 &&
      m.durationMs == 2500)
    // Multi-trak: an audio trak (0×0 dims) must not clobber the video
    // trak's dims — widest trak wins.
    val two = VideoCodec.encodeMp4Skeleton(0, 0, 1000) // audio-only shape
    val both = VideoCodec.parseMeta(
      VideoCodec.encodeMp4Skeleton(320, 240, 1000))
    assert(VideoCodec.parseMeta(two).width == 0)
    assert(both.width == 320 && both.height == 240)
  }

  test("JPEG constant-gray frames round-trip the quality-1.0 codec bit-exactly for ALL 256 values") {
    import graft.plans.{AviCodec, ImageCodec}
    // The fixture contract the m6 oracle leans on: a constant-gray
    // frame (R=G=B=v) survives the LOSSY codec exactly — Cb=Cr=128 for
    // gray, a constant block's DCT is its DC term alone, and the
    // quality-1.0 quantizer is lossless on it. Non-gray constants do
    // NOT round-trip (chroma rounding), so this pin is what licenses
    // using real JPEG under an exact arithmetic oracle.
    for (v <- 0 until 256) {
      val jpeg = AviCodec.encodeJpeg(24, 16, (_, _) => (v << 16) | (v << 8) | v)
      val pooled = ImageCodec.decodeMeanPool(jpeg, 1)
      assert(pooled != null && pooled.length == 3)
      assert(pooled.forall(_ == v / 255.0),
        s"gray $v decoded to ${pooled.toSeq}")
    }
  }

  test("real video pixel decode: MJPEG-AVI round-trip pools the exact ground-truth frames") {
    import graft.plans.{AviCodec, VideoCodec}
    val grays = Seq(17, 200, 85, 254)
    val frames = grays.map(v =>
      AviCodec.encodeJpeg(32, 16, (_, _) => (v << 16) | (v << 8) | v))
    val avi = AviCodec.encodeAviMjpeg(32, 16, usecPerFrame = 40000L, frames)
    // Direct codec round-trip: container meta and every frame payload.
    val m = AviCodec.meta(avi)
    assert(m.width == 32 && m.height == 16 && m.totalFrames == 4 &&
      m.durationMs == 160L)
    assert(AviCodec.frames(avi).toSeq.map(_.toSeq) == frames.map(_.toSeq))
    // video_meta covers RIFF/AVI too (one metadata surface for both
    // containers).
    val vm = VideoCodec.parseMeta(avi)
    assert(vm != null && vm.width == 32 && vm.height == 16 &&
      vm.durationMs == 160L)
    // Through the distributed stage: one row per frame, every pooled
    // cell exactly v/255 (constant frames pool to their gray level at
    // any grid).
    val rows = Seq((9L, avi)).toDF("media_id", "content")
    val out = Multimodal.extractFrameFeaturesVideo(rows, grid = 2)
      .select(col("media_id"), col("frame_idx"), col("features"))
      .as[(Long, Int, Seq[Double])].collect().sortBy(_._2)
    assert(out.length == 4)
    out.zip(grays).foreach { case ((_, _, feats), v) =>
      assert(feats.size == 12 && feats.forall(_ == v / 255.0))
    }
    // Non-AVI payloads decode to null rows (posexplode drops them);
    // a corrupt FRAME inside a valid container yields a null element,
    // not a crash.
    val junk = Seq((1L, "junk".getBytes("UTF-8"))).toDF("media_id", "content")
    assert(Multimodal.extractFrameFeaturesVideo(junk, 2).count() == 0)
    val torn = AviCodec.encodeAviMjpeg(32, 16, 40000L,
      Seq(frames.head, "garbage".getBytes("UTF-8"), frames.last))
    val tornOut = Multimodal.extractFrameFeaturesVideo(
        Seq((2L, torn)).toDF("media_id", "content"), 2)
      .select(col("frame_idx"), col("features").isNull)
      .as[(Int, Boolean)].collect().toMap
    assert(tornOut == Map(0 -> false, 1 -> true, 2 -> false))
  }

  test("real video pixel decode: photo-JPEG MOV round-trip pools the exact ground-truth frames") {
    import graft.plans.{AviCodec, VideoCodec}
    val grays = Seq(31, 144, 250, 7)
    val frames = grays.map(v =>
      AviCodec.encodeJpeg(32, 16, (_, _) => (v << 16) | (v << 8) | v))
    val mov = VideoCodec.encodeMovMjpeg(32, 16, usecPerFrame = 40000L,
      frames)
    // Direct codec round-trip: the sample-table walk recovers every
    // sample payload byte-for-byte, and the metadata surface reads
    // the same container.
    assert(VideoCodec.framesJpeg(mov).toSeq.map(_.toSeq) ==
      frames.map(_.toSeq))
    val vm = VideoCodec.parseMeta(mov)
    assert(vm != null && vm.width == 32 && vm.height == 16 &&
      vm.durationMs == 160L)
    // Through the distributed stage: one row per frame, every pooled
    // cell exactly v/255 — the same JPEG-invariant constant-gray
    // contract the AVI gate rides.
    val rows = Seq((9L, mov)).toDF("media_id", "content")
    val out = Multimodal.extractFrameFeaturesVideo(rows, grid = 2)
      .select(col("media_id"), col("frame_idx"), col("features"))
      .as[(Long, Int, Seq[Double])].collect().sortBy(_._2)
    assert(out.length == 4)
    out.zip(grays).foreach { case ((_, _, feats), v) =>
      assert(feats.size == 12 && feats.forall(_ == v / 255.0))
    }
    // A corrupt SAMPLE inside a valid container yields a null element.
    val torn = VideoCodec.encodeMovMjpeg(32, 16, 40000L,
      Seq(frames.head, "garbage".getBytes("UTF-8"), frames.last))
    val tornOut = Multimodal.extractFrameFeaturesVideo(
        Seq((2L, torn)).toDF("media_id", "content"), 2)
      .select(col("frame_idx"), col("features").isNull)
      .as[(Int, Boolean)].collect().toMap
    assert(tornOut == Map(0 -> false, 1 -> true, 2 -> false))
    // An ISO-BMFF container with NO jpeg sample table (the metadata
    // skeleton) is not decodable video — null, not a crash; the stub
    // seam covers such codecs.
    val skel = VideoCodec.encodeMp4Skeleton(320, 240, 1000L)
    assert(VideoCodec.framesJpeg(skel) == null)
    assert(Multimodal.extractFrameFeaturesVideo(
      Seq((3L, skel)).toDF("media_id", "content"), 2).count() == 0)
  }

  test("MOV sample-table walk expands multi-chunk stsc runs and refuses malformed tables") {
    import graft.plans.{AviCodec, VideoCodec}
    // 5 samples at 2 per chunk → chunks [2,2,1] → a genuine two-run
    // stsc the expansion must honor (chunk 3 switches to 1 sample).
    val grays = Seq(10, 60, 110, 160, 210)
    val frames = grays.map(v =>
      AviCodec.encodeJpeg(16, 16, (_, _) => (v << 16) | (v << 8) | v))
    val mov = VideoCodec.encodeMovMjpeg(16, 16, 40000L, frames,
      samplesPerChunk = 2)
    assert(VideoCodec.framesJpeg(mov).toSeq.map(_.toSeq) ==
      frames.map(_.toSeq))
    // The 64-bit chunk-offset table (co64 — what any >4 GiB file
    // carries) walks identically.
    val mov64 = VideoCodec.encodeMovMjpeg(16, 16, 40000L, frames,
      samplesPerChunk = 2, useCo64 = true)
    assert(VideoCodec.framesJpeg(mov64).toSeq.map(_.toSeq) ==
      frames.map(_.toSeq))
    // Every prefix truncation parses to null, never throws or hangs.
    for (len <- 0 until mov.length by 13)
      VideoCodec.framesJpeg(java.util.Arrays.copyOf(mov, len))
    // A chunk offset escaping the buffer is malformed → null. stco
    // sits near the end; corrupt its last offset bytes.
    val bad = mov.clone()
    var i = bad.length - 8
    var patched = false
    while (i >= 0 && !patched) {
      if (bad(i) == 's' && bad(i + 1) == 't' && bad(i + 2) == 'c' &&
        bad(i + 3) == 'o') {
        bad(i + 12) = 0x7F.toByte // first offset → far past the buffer
        patched = true
      }
      i -= 1
    }
    assert(patched)
    assert(VideoCodec.framesJpeg(bad) == null)
    // Foreign bytes: null, not a crash.
    assert(VideoCodec.framesJpeg("not a movie at all".getBytes) == null)
    assert(VideoCodec.framesJpeg(Array.fill[Byte](64)(0x41)) == null)
  }

  test("MJPEG decode handles non-constant frames through the same path (within codec tolerance)") {
    import graft.plans.{AviCodec, ImageCodec}
    // A gradient frame: lossy, so no exactness — the pooled means must
    // land within a small JPEG tolerance of the analytic means. This
    // pins that the decode path is the real general codec, not a
    // constant-frame special case.
    val w = 32; val h = 32
    def px(x: Int, y: Int): Int = {
      val r = x * 255 / (w - 1); val g = y * 255 / (h - 1); val b = 128
      (r << 16) | (g << 8) | b
    }
    val jpeg = AviCodec.encodeJpeg(w, h, px, quality = 0.95f)
    val pooled = ImageCodec.decodeMeanPool(jpeg, 1)
    def mean(c: Int): Double = {
      var s = 0L
      for (y <- 0 until h; x <- 0 until w)
        s += (px(x, y) >>> (16 - 8 * c)) & 0xFF
      s.toDouble / (w * h) / 255.0
    }
    for (c <- 0 until 3)
      assert(math.abs(pooled(c) - mean(c)) < 3.0 / 255.0,
        s"channel $c: ${pooled(c)} vs ${mean(c)}")
  }

  test("wav_synth generates real WAVs whose decoded pooling matches the driver-side encoder bit-for-bit") {
    import org.apache.spark.sql.functions.call_function
    import graft.plans.{AudioCodec, ImageCodec, WavSynthExpr}
    WavSynthExpr.register(spark)
    val viaExpr = Multimodal.extractFeaturesAudio(
        (1L to 10L).toDF("media_id").select(col("media_id"),
          call_function(WavSynthExpr.Name, col("media_id"),
            (lit(500) + pmod(col("media_id"), lit(7)) * 100).cast("int"))
            .as("content")),
        dim = 4)
      .select("media_id", "features").as[(Long, Seq[Double])]
      .collect().toMap
    val viaDriver = (1L to 10L).map { id =>
      val n = (500 + (id % 7) * 100).toInt
      id -> AudioCodec.decodeMeanPool(
        AudioCodec.encodeWavPcm16(Array.tabulate(n)(t =>
          (ImageCodec.synthPixel(id, 1, 0, t) & 0xFFFF).toShort)),
        4).toSeq
    }.toMap
    assert(viaExpr == viaDriver)
  }

  test("mov_synth generates real MOVs whose decoded frames match the driver-side encoder bit-for-bit") {
    import org.apache.spark.sql.functions.call_function
    import graft.plans.{AviCodec, ImageCodec, MovSynthExpr, VideoCodec}
    MovSynthExpr.register(spark)
    val viaExpr = Multimodal.extractFrameFeaturesVideo(
        (1L to 6L).toDF("media_id").select(col("media_id"),
          call_function(MovSynthExpr.Name, col("media_id"), lit(24),
            lit(16), lit(3), lit(90)).as("content")),
        grid = 2)
      .select("media_id", "frame_idx", "features")
      .as[(Long, Int, Seq[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val viaDriver = (for (id <- 1L to 6L; f <- 0 until 3) yield {
      val jpeg = AviCodec.encodeJpeg(24, 16,
        (x, y) => ImageCodec.synthPixel(id * 1009L + f, 24, x, y),
        quality = 0.9f)
      (id, f) -> ImageCodec.decodeMeanPool(jpeg, 2).toSeq
    }).toMap
    assert(viaExpr == viaDriver)
    // And the container really is ISO-BMFF, not AVI: the AVI walk
    // refuses it, the sample-table walk serves it.
    val one = VideoCodec.encodeMovMjpeg(24, 16, 40000L,
      Seq(AviCodec.encodeJpeg(24, 16, (_, _) => 0x808080)))
    assert(AviCodec.frames(one) == null)
    assert(VideoCodec.framesJpeg(one) != null)
  }

  test("AVI parsing refuses malformed containers without crashing: truncations, bad sizes, foreign bytes") {
    import graft.plans.AviCodec
    val good = AviCodec.encodeAviMjpeg(16, 16, 40000L,
      Seq(AviCodec.encodeJpeg(16, 16, (_, _) => 0x808080)))
    assert(AviCodec.frames(good) != null && AviCodec.meta(good) != null)
    // Every prefix truncation parses to null-or-fewer-frames, never
    // throws — a crawl always carries torn files.
    for (len <- 0 until good.length by 7) {
      val t = java.util.Arrays.copyOf(good, len)
      AviCodec.meta(t); AviCodec.frames(t) // must not throw
    }
    // A chunk size escaping the file window is malformed, not a loop.
    val bad = good.clone()
    bad(16) = 0xFF.toByte; bad(17) = 0xFF.toByte // first hdrl child size
    AviCodec.meta(bad) // must not throw or hang
    // Foreign container magic parses to null.
    assert(AviCodec.meta("RIFFxxxxWAVEfmt ".getBytes("US-ASCII")) == null)
    assert(AviCodec.meta(Array.fill[Byte](64)(0x41)) == null)
    // And through the expression: nulls, not exceptions.
    val rows = Seq((1L, java.util.Arrays.copyOf(good, 40)),
      (2L, "RIFF".getBytes("US-ASCII")))
      .toDF("media_id", "content")
    assert(Multimodal.extractFrameFeaturesVideo(rows, 2).count() == 0)
  }

  test("rebalanceBySize plans an AQE rebalance, no driver-side count") {
    val plan = Multimodal.rebalanceBySize(media)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("RebalancePartitions") ||
      plan.contains("rebalance"), plan)
    // rows and payload untouched
    assert(Multimodal.rebalanceBySize(media).count() == media.count())
  }
}
