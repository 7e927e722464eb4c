package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Scalars
import graft.llm.{Dedup, IndexStore, Multimodal, Similarity, TextAnalysis, TokenizerStore}
import graft.Checkpoints.TruncateOps

/** LLM-training-data pipeline ops over `documents` and `embeddings`:
  * dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
  * search (brute-force + LSH-bucketed ANN), text analysis.
  *
  * Oracle strategy: everything whose math is engine-portable gets a
  * DuckDB oracle (integer-ratio doubles are IEEE-exact in both engines);
  * hash-family-dependent ops (xxhash64 has no DuckDB twin) are
  * rows-only here and covered by golden ScalaTest specs instead. */
object LlmQueries {

  /** The t12/pipe20 training replay: 3 unrolled batch-perceptron
    * iterations over a `dc (doc_id, y, f, c)` feature CTE the caller
    * provides. Iteration 1 bootstraps from w = 0 (every doc scores 0,
    * y·0 ≤ 0 marks all misclassified, so w1 is the full class-
    * difference sum); iterations 2-3 are score → misclassify → delta.
    * d's f is always ⊆ w1's f (both come from dc), so LEFT JOIN is
    * exact where a FULL JOIN would be needed in general. */
  private val TrainCte =
    """w1 AS (SELECT f, SUM(y * c) AS w FROM dc GROUP BY f),
      |m2 AS (SELECT doc_id FROM (
      |         SELECT dc.doc_id, dc.y, SUM(dc.c * w1.w) AS s
      |         FROM dc JOIN w1 USING (f) GROUP BY 1, 2)
      |       WHERE y * s <= 0),
      |w2 AS (SELECT w1.f, w1.w + COALESCE(d.dw, 0) AS w
      |       FROM w1 LEFT JOIN (
      |         SELECT dc.f, SUM(dc.y * dc.c) AS dw
      |         FROM dc JOIN m2 USING (doc_id) GROUP BY dc.f) d USING (f)),
      |m3 AS (SELECT doc_id FROM (
      |         SELECT dc.doc_id, dc.y, SUM(dc.c * w2.w) AS s
      |         FROM dc JOIN w2 USING (f) GROUP BY 1, 2)
      |       WHERE y * s <= 0),
      |w3 AS (SELECT w2.f, w2.w + COALESCE(d.dw, 0) AS w
      |       FROM w2 LEFT JOIN (
      |         SELECT dc.f, SUM(dc.y * dc.c) AS dw
      |         FROM dc JOIN m3 USING (doc_id) GROUP BY dc.f) d USING (f))""".stripMargin

  /** How many documents get a PNG in the real-decode fixture — bounded
    * so the oracle's pixel-replay CTE and pipe23's exact self-join
    * stay cheap (the scale path is LSH over the same features). */
  private val PngMediaDocs = 150

  /** Real-PNG media fixture: one genuine PNG per document
    * (doc_id < [[PngMediaDocs]]), size (8 + id%5)×(8 + id%3), pixel
    * channel c at (x, y) = (id·73 + (y·W + x)·97 + c·31) mod 256 — an
    * arithmetic ground truth the DuckDB oracles replay, while the
    * Spark side receives ONLY the encoded bytes and must run the real
    * decoder. Driver-side encode of ≤150 tiny images (bounded fixture
    * builder, the e14/d12 discipline); the decode under test runs
    * distributed. */
  private def pngMedia(s: org.apache.spark.sql.SparkSession,
                       d: String): org.apache.spark.sql.DataFrame = {
    val ids = Tables.documents(s, d).filter(col("doc_id") < PngMediaDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val rows = ids.map { id =>
      val w = (8 + id % 5).toInt
      val h = (8 + id % 3).toInt
      def v(c: Int, x: Int, y: Int): Int =
        ((id * 73 + (y.toLong * w + x) * 97 + c * 31) % 256).toInt
      (id, graft.plans.ImageCodec.encodePng(w, h,
        (x, y) => (v(0, x, y) << 16) | (v(1, x, y) << 8) | v(2, x, y)))
    }
    import s.implicits._
    rows.toDF("media_id", "content")
      .withColumn("meta", struct(lit("image/png").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")))
  }

  /** Corpus-scale real-PNG fixture for the decode-throughput heavy
    * entry: one genuine PNG per document of the given dir (same pixel
    * formula as [[pngMedia]], dims 16+id%9 × 16+id%7 RGB), synthesized
    * DISTRIBUTED via the `png_synth` expression and cached under the
    * shared stamped-dir convention. Returns the parquet path. */
  def ensurePngFixture(s: org.apache.spark.sql.SparkSession,
                       d: String): String = {
    // v2: png_synth switched from the filter-collapsible linear pixel
    // formula to avalanche noise (see PngSynthExpr) — real ~3 B/px
    // PNGs instead of 124 B degenerates.
    val base = Fixtures.stampedDir(d, "documents", "png_media", 2)
    val target = base.resolve("media")
    if (!java.nio.file.Files.exists(target)) {
      val tmp = java.nio.file.Files.createTempDirectory(base, "media.part")
      try {
        graft.plans.PngSynthExpr.register(s)
        val built = tmp.resolve("p")
        Tables.documents(s, d).select(
            col("doc_id").as("media_id"),
            call_function(graft.plans.PngSynthExpr.Name, col("doc_id"),
              (lit(16) + pmod(col("doc_id"), lit(9))).cast("int"),
              (lit(16) + pmod(col("doc_id"), lit(7))).cast("int"))
              .as("content"))
          .write.parquet(built.toString)
        Fixtures.publish(built, target)
      } finally Fixtures.deleteRecursively(tmp)
    }
    target.toString
  }

  /** PDF fixture for the extraction-throughput heavy entry: one
    * genuine multi-page Flate PDF per heavy-corpus document (320 K
    * docs → ~1.3 K chars each → ~9 pages at 150 chars/page),
    * synthesized DISTRIBUTED via `pdf_synth` under the stamped-dir
    * convention so the timed entry measures inflate + operator parse,
    * not synthesis. */
  def ensurePdfFixture(s: org.apache.spark.sql.SparkSession,
                       d: String): String = {
    val base = Fixtures.stampedDir(d, "documents", "pdf_media", 1)
    val target = base.resolve("media")
    if (!java.nio.file.Files.exists(target)) {
      val tmp = java.nio.file.Files.createTempDirectory(base, "media.part")
      try {
        graft.plans.PdfSynthExpr.register(s)
        val built = tmp.resolve("p")
        Tables.documents(s, d).select(
            col("doc_id").as("media_id"),
            call_function(graft.plans.PdfSynthExpr.Name, col("text"),
              lit(150)).as("content"))
          .repartition(32)
          .write.parquet(built.toString)
        Fixtures.publish(built, target)
      } finally Fixtures.deleteRecursively(tmp)
    }
    target.toString
  }

  /** Crawl-REALISTIC media fixture for the decode-MB/s heavy entry:
    * 40 K images at 128–512 px per side (even ids real PNG, odd ids
    * real JPEG q0.8 — the 50/50 mix a web crawl skews between),
    * avalanche-noise content so neither codec shortcuts, synthesized
    * DISTRIBUTED via `png_synth`/`jpeg_synth` under the stamped-dir
    * convention. ~7.7 GB encoded, ~190 KB/image — the regime where
    * per-image decode cost is pixel-bound, not per-row-overhead-bound
    * (the m3 fixture's 16–23 px images measure the opposite end).
    *
    * Pixel SEEDS come in cross-codec pairs: odd ids re-encode their
    * even neighbor's exact pixels as JPEG (seed = id − id%2, dims from
    * the seed) — the re-encoded-copy shape a crawl image corpus
    * actually carries, giving the corpus 20 K genuine near-dup pairs
    * (PNG exact vs JPEG q0.8 of the same noise: pooled-feature cosine
    * ≈ 0.99 after centering, unrelated images ≲ 0.3) for the
    * decode→features→LSH composite entry, with the decode workload's
    * size/format distribution unchanged. Returns the parquet path. */
  /** Logic version of [[ensureRealisticMediaFixture]]'s content.
    * Folded into DERIVED fixtures' stamps too (the image bucket
    * table below derives from this fixture's bytes): bumping the
    * media fixture must invalidate everything computed from it, or a
    * stale standing-bucket artifact silently serves pairs for pixels
    * that no longer exist — the silent-vanish failure the incremental
    * operator's own contract warns about. */
  private val MediaFixtureVersion = 4

  def ensureRealisticMediaFixture(s: org.apache.spark.sql.SparkSession,
                                  d: String): String = {
    // v2: avalanche-noise pixels (see PngSynthExpr) — encoded sizes
    // are content-honest (~3 B/px PNG, ~1 B/px JPEG q0.8). v3: 40 K
    // images (the decode entry runs ~10 s, drowning cross-run
    // page-cache noise) + the paired-seed near-dup structure. v4:
    // written 256-way — at 32 files each row group held ~112 MB of
    // binary rows, and 32 concurrent scan tasks materializing those
    // batches overran an 8 GB driver heap; ~28 MB row groups keep the
    // columnar batches bounded (rows are ~190 KB EACH — row-group
    // size, not row count, is the memory knob for blob tables).
    val base = Fixtures.stampedDir(d, "documents", "media_realistic",
      MediaFixtureVersion)
    val target = base.resolve("media")
    if (!java.nio.file.Files.exists(target)) {
      val tmp = java.nio.file.Files.createTempDirectory(base, "media.part")
      try {
        graft.plans.PngSynthExpr.register(s)
        graft.plans.JpegSynthExpr.register(s)
        val seed = col("doc_id") - pmod(col("doc_id"), lit(2))
        val w = (lit(128) + pmod(seed * 97, lit(385))).cast("int")
        val h = (lit(128) + pmod(seed * 53, lit(385))).cast("int")
        val built = tmp.resolve("p")
        Tables.documents(s, d).select("doc_id")
          .filter(col("doc_id") < 40000)
          .select(col("doc_id").as("media_id"),
            when(col("doc_id") % 2 === 0,
              call_function(graft.plans.PngSynthExpr.Name, seed, w, h))
            .otherwise(
              call_function(graft.plans.JpegSynthExpr.Name, seed, w, h))
              .as("content"),
            when(col("doc_id") % 2 === 0, "png").otherwise("jpeg")
              .as("fmt"))
          // 256-way: bounds each row group to ~28 MB of ~190 KB blob
          // rows (see the v4 note above).
          .repartition(256)
          .write.parquet(built.toString)
        Fixtures.publish(built, target)
      } finally Fixtures.deleteRecursively(tmp)
    }
    target.toString
  }

  /** The STANDING image-dedup state for the incremental heavy entry:
    * the realistic fixture's even ids (yesterday's corpus — the PNG
    * originals) decoded once, centered, and staged into the sign-LSH
    * (tbl, bkt, doc, v) bucket table, persisted like a production
    * nightly job would leave it. Params MUST match the incremental
    * entry's call (planes 12 / tables 6 / dim 48 — the
    * embeddingNearDupPairsIncremental contract). Returns the parquet
    * path. */
  def ensureImageBucketFixture(s: org.apache.spark.sql.SparkSession,
                               d: String): String = {
    // The media fixture's logic version is part of THIS stamp's kind:
    // the buckets are computed FROM those bytes, so a media bump must
    // invalidate them (see MediaFixtureVersion).
    val base = Fixtures.stampedDir(d, "documents",
      s"image_buckets_m$MediaFixtureVersion", 1)
    val target = base.resolve("buckets")
    if (!java.nio.file.Files.exists(target)) {
      val tmp = java.nio.file.Files.createTempDirectory(base, "b.part")
      try {
        val media = s.read.parquet(ensureRealisticMediaFixture(s, d))
          .filter(col("media_id") % 2 === 0)
        val feats = graft.llm.Multimodal.extractFeaturesImage(media,
            grid = 4)
          .select(col("media_id").as("doc"),
            transform(col("features"), f => f - lit(0.5))
              .cast("array<float>").as("v"))
        val built = tmp.resolve("p")
        feats.select(col("doc"), col("v"),
            posexplode(graft.llm.Similarity.lshBucketsAll(s, col("v"),
              6, 12, 48)).as(Seq("tbl", "bkt")))
          .repartition(32, col("tbl"), col("bkt"))
          .write.parquet(built.toString)
        Fixtures.publish(built, target)
      } finally Fixtures.deleteRecursively(tmp)
    }
    target.toString
  }

  /** Crawl-realistic VIDEO fixture for the decode-MB/s heavy entry:
    * 6 K genuine MJPEG-AVIs of 8 frames at 128–256 px per side
    * (avalanche-noise JPEG frames ≈ 40 KB each), synthesized
    * DISTRIBUTED via `avi_synth` under the stamped-dir convention —
    * ~48 K frames, ~2 GB encoded.
    *
    * Like the image fixture, pixel SEEDS come in cross-encode pairs:
    * odd ids re-encode their even neighbor's exact frames at JPEG
    * q0.7 instead of q0.8 (seed = id − id%2, dims from the seed) —
    * the re-encoded-copy shape a crawl video corpus actually carries
    * (pipe28's content-dup fixture at toy scale varies only container
    * timing; THIS one re-runs the lossy codec, so the 3 K pairs are
    * genuine NEAR-dups: per-video mean pooled-feature cosine ≈ 0.98
    * centered, unrelated videos ≲ 0.33). CONTAINERS mix 50/50:
    * id%4 ∈ {0,3} are RIFF/AVI, {1,2} are photo-JPEG MOV (real
    * ISO-BMFF sample tables via `mov_synth`) — so the decode entry
    * exercises BOTH container walks at scale and every near-dup pair
    * ALSO crosses containers (re-encoded AND re-containered, the
    * strongest copy shape). Returns the parquet path. */
  def ensureVideoFixture(s: org.apache.spark.sql.SparkSession,
                         d: String): String = {
    // v2: 6 K videos (stability + composite scale), paired-seed
    // re-encode structure, 64-way write (≈33 MB row groups of ~350 KB
    // blob rows — the media_realistic v4 memory discipline). v3:
    // 50/50 AVI / MOV container mix with every pair cross-container.
    val base = Fixtures.stampedDir(d, "documents", "video_media", 3)
    val target = base.resolve("media")
    if (!java.nio.file.Files.exists(target)) {
      val tmp = java.nio.file.Files.createTempDirectory(base, "media.part")
      try {
        graft.plans.AviSynthExpr.register(s)
        graft.plans.MovSynthExpr.register(s)
        val seed = col("doc_id") - pmod(col("doc_id"), lit(2))
        val w = (lit(128) + pmod(seed * 97, lit(129))).cast("int")
        val h = (lit(128) + pmod(seed * 53, lit(129))).cast("int")
        val q = when(col("doc_id") % 2 === 0, 80).otherwise(70)
          .cast("int")
        val built = tmp.resolve("p")
        Tables.documents(s, d).select("doc_id")
          .filter(col("doc_id") < 6000)
          .select(col("doc_id").as("media_id"),
            when(pmod(col("doc_id"), lit(4)).isin(0, 3),
              call_function(graft.plans.AviSynthExpr.Name, seed, w, h,
                lit(8), q))
            .otherwise(
              call_function(graft.plans.MovSynthExpr.Name, seed, w, h,
                lit(8), q)).as("content"),
            when(pmod(col("doc_id"), lit(4)).isin(0, 3), "avi")
              .otherwise("mov").as("fmt"))
          .repartition(64)
          .write.parquet(built.toString)
        Fixtures.publish(built, target)
      } finally Fixtures.deleteRecursively(tmp)
    }
    target.toString
  }

  /** Crawl-realistic AUDIO fixture for the decode-MB/s heavy entry:
    * 20 K genuine 16-bit PCM WAVs of 2–6 s at 8 kHz (16–48 K samples,
    * 32–96 KB each — ~1.3 GB total), synthesized DISTRIBUTED via
    * `wav_synth` under the stamped-dir convention. Returns the parquet
    * path. */
  def ensureAudioFixture(s: org.apache.spark.sql.SparkSession,
                         d: String): String = {
    // v2: avalanche-noise samples (see WavSynthExpr) so the on-disk
    // bytes the MB/s is computed over match the payload decoded. v3:
    // 20 K clips — the ~1 s entry sat in the short-entry noise class
    // m7 escaped by growing (±25-80% cross-run on page-cache state);
    // at ~4 s the noise is sub-dominant. 64-way write (the blob-row
    // row-group discipline).
    val base = Fixtures.stampedDir(d, "documents", "audio_media", 3)
    val target = base.resolve("media")
    if (!java.nio.file.Files.exists(target)) {
      val tmp = java.nio.file.Files.createTempDirectory(base, "media.part")
      try {
        graft.plans.WavSynthExpr.register(s)
        val built = tmp.resolve("p")
        Tables.documents(s, d).select("doc_id")
          .filter(col("doc_id") < 20000)
          .select(col("doc_id").as("media_id"),
            call_function(graft.plans.WavSynthExpr.Name, col("doc_id"),
              (lit(16000) + pmod(col("doc_id") * 97, lit(32001)))
                .cast("int")).as("content"))
          .repartition(64)
          .write.parquet(built.toString)
        Fixtures.publish(built, target)
      } finally Fixtures.deleteRecursively(tmp)
    }
    target.toString
  }

  /** Real-WAV media fixture — [[pngMedia]]'s audio sibling: one
    * genuine 16-bit PCM WAV per document (doc_id < [[PngMediaDocs]]),
    * length 400 + (id%7)·50 samples, sample t =
    * (id·131 + t·17) mod 4001 − 2000 — ground truth the oracle
    * replays while the Spark side must run the real decoder. */
  private def wavMedia(s: org.apache.spark.sql.SparkSession,
                       d: String): org.apache.spark.sql.DataFrame = {
    val ids = Tables.documents(s, d).filter(col("doc_id") < PngMediaDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val rows = ids.map { id =>
      val n = (400 + (id % 7) * 50).toInt
      val samples = Array.tabulate(n)(t =>
        ((id * 131 + t.toLong * 17) % 4001 - 2000).toShort)
      (id, graft.plans.AudioCodec.encodeWavPcm16(samples))
    }
    import s.implicits._
    rows.toDF("media_id", "content")
      .withColumn("meta", struct(lit("audio/wav").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")))
  }

  /** Real-MP4 media fixture — genuine ISO-BMFF skeletons
    * (`ftyp`+`moov{mvhd,trak{tkhd}}`+`mdat`, the byte layout any muxer
    * writes) with width/height/duration from an arithmetic formula;
    * the meta struct is all-null so the only way m5 can produce dims
    * and durations is by PARSING the container bytes. */
  private def mp4Media(s: org.apache.spark.sql.SparkSession,
                       d: String): org.apache.spark.sql.DataFrame = {
    val ids = Tables.documents(s, d).filter(col("doc_id") < PngMediaDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val rows = ids.map { id =>
      (id, graft.plans.VideoCodec.encodeMp4Skeleton(
        width = (320 + (id % 5) * 16).toInt,
        height = (240 + (id % 3) * 16).toInt,
        durationMs = 1000 + (id % 11) * 500))
    }
    import s.implicits._
    rows.toDF("media_id", "content")
      .withColumn("meta", struct(lit("video/mp4").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")))
  }

  /** Real MJPEG-AVI media fixture — genuine RIFF/AVI containers whose
    * `00dc` chunks are real JPEGs (JDK encoder, quality 1.0). Frame f
    * of doc id is CONSTANT GRAY v = (id·37 + f·59) mod 256: the
    * JPEG-invariant subset — constant-gray frames round-trip the lossy
    * codec bit-exactly at quality 1.0 (pinned for all 256 values by
    * MultimodalSpec) — so the oracle's pixel formula stays exact while
    * the Spark side must run the real container walk AND the real
    * JPEG decode. Dims are multiples of 8 (whole MCU blocks). */
  private def aviMedia(s: org.apache.spark.sql.SparkSession,
                       d: String): org.apache.spark.sql.DataFrame = {
    val ids = Tables.documents(s, d).filter(col("doc_id") < PngMediaDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val rows = ids.map { id =>
      val w = (16 + (id % 3) * 8).toInt
      val h = (16 + (id % 2) * 8).toInt
      val frames = (0 until (2 + id % 4).toInt).map { f =>
        val v = ((id * 37 + f * 59) % 256).toInt
        graft.plans.AviCodec.encodeJpeg(w, h,
          (_, _) => (v << 16) | (v << 8) | v)
      }
      (id, graft.plans.AviCodec.encodeAviMjpeg(w, h,
        usecPerFrame = 40000L, frames))
    }
    import s.implicits._
    rows.toDF("media_id", "content")
      .withColumn("meta", struct(lit("video/x-msvideo").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")))
  }

  /** Real photo-JPEG MOV fixture — [[aviMedia]]'s ISO-BMFF sibling:
    * genuine QuickTime containers (`ftyp`+`mdat`+`moov` with the full
    * `stsd('jpeg')`/`stts`/`stsc`/`stsz`/`stco` sample table) whose
    * samples are real JPEGs at quality 1.0. Frame f of doc id is
    * CONSTANT GRAY v = (id·41 + f·67) mod 256 — the JPEG-invariant
    * subset (see [[aviMedia]]) — so the oracle's pixel formula stays
    * exact while the Spark side must run the real box walk, the real
    * sample-table expansion, AND the real JPEG decode. A deliberately
    * different gray/frame-count formula from m6's AVI fixture keeps
    * the two container gates independent. */
  private def movMedia(s: org.apache.spark.sql.SparkSession,
                       d: String): org.apache.spark.sql.DataFrame = {
    val ids = Tables.documents(s, d).filter(col("doc_id") < PngMediaDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val rows = ids.map { id =>
      val w = (16 + (id % 2) * 8).toInt
      val h = (16 + (id % 3) * 8).toInt
      val frames = (0 until (2 + id % 3).toInt).map { f =>
        val v = ((id * 41 + f * 67) % 256).toInt
        graft.plans.AviCodec.encodeJpeg(w, h,
          (_, _) => (v << 16) | (v << 8) | v)
      }
      (id, graft.plans.VideoCodec.encodeMovMjpeg(w, h,
        usecPerFrame = 40000L, frames))
    }
    import s.implicits._
    rows.toDF("media_id", "content")
      .withColumn("meta", struct(lit("video/quicktime").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")))
  }

  /** MJPEG-AVI fixture with CONTENT-level duplicates: videos sharing
    * `doc_id mod 50` carry pixel-identical frame sequences (same gray
    * formula, same dims, same frame count) but DIFFERENT container
    * bytes — `usecPerFrame` varies per doc — so a byte-hash dedup
    * finds nothing and only decoding the frames reveals the groups.
    * The re-encoded-copy shape a crawl video corpus actually has. */
  private def aviDupMedia(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame = {
    val ids = Tables.documents(s, d).filter(col("doc_id") < PngMediaDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val rows = ids.map { id =>
      val g = id % 50
      val w = (16 + (g % 3) * 8).toInt
      val h = (16 + (g % 2) * 8).toInt
      val frames = (0 until (2 + g % 4).toInt).map { f =>
        val v = ((g * 37 + f * 59) % 256).toInt
        graft.plans.AviCodec.encodeJpeg(w, h,
          (_, _) => (v << 16) | (v << 8) | v)
      }
      // Container timing differs PER DOC: byte-identical dup detection
      // cannot group these; decoded-content fingerprinting must.
      (id, graft.plans.AviCodec.encodeAviMjpeg(w, h,
        usecPerFrame = 40000L + id * 7, frames))
    }
    import s.implicits._
    rows.toDF("media_id", "content")
  }

  /** [[aviDupMedia]] with the dup groups split ACROSS containers:
    * even ids mux their frames as RIFF/AVI (timing varies per doc,
    * like aviDupMedia), odd ids as photo-JPEG MOV — same pixel
    * content, maximally different bytes. Content-level dedup must
    * reunite group members regardless of which muxer wrote them. */
  private def mixedDupMedia(s: org.apache.spark.sql.SparkSession,
                            d: String): org.apache.spark.sql.DataFrame = {
    val ids = Tables.documents(s, d).filter(col("doc_id") < PngMediaDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val rows = ids.map { id =>
      val g = id % 50
      val w = (16 + (g % 3) * 8).toInt
      val h = (16 + (g % 2) * 8).toInt
      val frames = (0 until (2 + g % 4).toInt).map { f =>
        val v = ((g * 37 + f * 59) % 256).toInt
        graft.plans.AviCodec.encodeJpeg(w, h,
          (_, _) => (v << 16) | (v << 8) | v)
      }
      val bytes =
        if (id % 2 == 0)
          graft.plans.AviCodec.encodeAviMjpeg(w, h,
            usecPerFrame = 40000L + id * 7, frames)
        else graft.plans.VideoCodec.encodeMovMjpeg(w, h,
          usecPerFrame = 40000L, frames)
      (id, bytes)
    }
    import s.implicits._
    rows.toDF("media_id", "content")
  }

  def all: Seq[Q] = Seq(

    // Exact dedup groups by order-insensitive fingerprint.
    Q("d1_exact_dup_groups",
      """SELECT md5(array_to_string(list_sort(string_split(trim(text), ' ')), ' ')) AS fp,
        |       min(doc_id) AS canonical_id,
        |       CAST(count(*) AS BIGINT) AS group_size,
        |       array_to_string(list_sort(array_agg(doc_id)), ',') AS members
        |FROM documents GROUP BY 1""".stripMargin) { (s, d) =>
      Dedup.exactGroups(Tables.documents(s, d), "doc_id", "text")
        .select(col("fp"), col("canonical_id"), col("group_size"),
          array_join(transform(col("member_ids"), _.cast("string")), ",").as("members"))
    },

    // Exact n-gram (token-set) Jaccard pairs on a bounded subset — the
    // oracle-checkable baseline for the LSH scale path below.
    Q("d2_jaccard_pairs",
      """WITH t AS (
        |  SELECT doc_id, list_distinct(string_split(trim(text), ' ')) AS toks
        |  FROM documents WHERE doc_id < 100)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       len(list_intersect(a.toks, b.toks)) /
        |       (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.toks, b.toks)) /
        |      (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.85""".stripMargin) { (s, d) =>
      Dedup.jaccardPairsExact(
        Tables.documents(s, d).filter(col("doc_id") < 100), "doc_id", "text", 0.85)
    },

    // MinHash + LSH banded near-dup pairs — the 100 TB path (bucket
    // join on band hashes, never all-pairs). Hash family is xxhash64 →
    // no SQL oracle; verified by spec against the exact-Jaccard op.
    // The bucket cap is ON here: this synthetic corpus is pathologically
    // self-similar (~25% of ALL pairs exceed the threshold), so the true
    // pair set is quadratic — the cap is exactly the guard a production
    // dedup runs with to bound fan-out on boilerplate-heavy shards.
    Q.rowsOnly("d3_minhash_lsh_pairs") { (s, d) =>
      Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.8, maxBucketSize = Some(100))
    },

    // One-permutation MinHash variant of d3: one aggregate update per
    // (doc, shingle) instead of 128, through the identical banding/
    // candidate/exact-verification back-half — the signature pass for
    // LONG-document corpora where that stage dominates. On THIS
    // short-document corpus (~200 tokens vs 128 bins) OPH's banded
    // recall is deliberately the documented weak regime (~13% of d3's
    // pairs at 0.8) — registered to gate the plumbing, with d3 as the
    // short-doc default; every emitted pair is still exact-verified.
    // The regime is now also guarded AT RUNTIME: the operator probes
    // mean distinct shingles vs bins on construction and logs a
    // structured warning in exactly this situation (ophRegimeWarning;
    // DedupSpec pins the boundary), so a user picking OPH for short
    // docs no longer gets silent recall loss.
    Q.rowsOnly("d11_minhash_oph_pairs") { (s, d) =>
      Dedup.minhashLshPairsOph(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.8, maxBucketSize = Some(100))
    },

    // Portable OPH signatures — d11's signature math (one hash per
    // shingle, per-bin min, circular next-occupied densification) over
    // the md5 token core, fully oracle-checked: the oracle rebuilds the
    // densified signature with a backward-fill window (first occupied
    // bin at-or-after each position, wrapping to the doc's first
    // occupied bin), which is exactly the segment expansion the Spark
    // side performs as a pure array expression. Closes the last
    // dedup-family member whose signature math had no hash gate.
    Q("d14_minhash_oph_portable_sig",
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' '))) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id,
        |        CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 2147483648 AS hc
        |      FROM toks),
        |occ AS (SELECT doc_id, hc % 128 AS bin, min(hc) AS mh
        |        FROM h GROUP BY doc_id, hc % 128),
        |pos AS (SELECT d.doc_id, p.p
        |        FROM (SELECT DISTINCT doc_id FROM occ) d
        |        CROSS JOIN (SELECT unnest(range(0, 128)) AS p) p),
        |fill AS (SELECT pos.doc_id, pos.p,
        |           first_value(o.mh IGNORE NULLS) OVER (
        |             PARTITION BY pos.doc_id ORDER BY pos.p
        |             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt,
        |           first_value(o.mh IGNORE NULLS) OVER (
        |             PARTITION BY pos.doc_id ORDER BY pos.p
        |             ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND UNBOUNDED FOLLOWING) AS wrap
        |         FROM pos LEFT JOIN occ o
        |           ON o.doc_id = pos.doc_id AND o.bin = pos.p)
        |SELECT doc_id,
        |       string_agg(CAST(coalesce(nxt, wrap) AS VARCHAR), ','
        |                  ORDER BY p) AS sig
        |FROM fill GROUP BY doc_id""".stripMargin) { (s, d) =>
      Dedup.minhashOphSignature(Tables.documents(s, d), "doc_id", "text",
          bins = 128, portable = true)
        .select(col("doc").as("doc_id"),
          array_join(transform(col("sig"), _.cast("string")), ",").as("sig"))
    },

    // Portable MinHash signatures — the same (a·h+b) mod p permutation
    // family as d3 over an md5 token core, fully oracle-checked, so the
    // signature math itself has a green gate (d3's xxhash64 family is
    // rows-only by necessity).
    Q("d9_minhash_portable_sig", {
      val seedRows = Dedup.minhashCoeffs(32).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' '))) AS tok
         |  FROM documents),
         |h AS (SELECT doc_id,
         |        CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 2147483648 AS hc
         |      FROM toks),
         |seeds(i, a, b) AS (VALUES $seedRows),
         |m AS (SELECT doc_id, i, min((hc * a + b) % 2147483647) AS mh
         |      FROM h CROSS JOIN seeds GROUP BY doc_id, i)
         |SELECT doc_id, string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
         |FROM m GROUP BY doc_id""".stripMargin
    }) { (s, d) =>
      Dedup.minhashSignaturePortable(Tables.documents(s, d), "doc_id", "text")
    },

    // Incremental near-dup dedup — the nightly shape: pairs touching a
    // new increment against the standing corpus, corpus × corpus never
    // re-paired. Portable twin: md5 token core + raw band-slice bucket
    // keys, so the ENTIRE path — signature, banding, candidate
    // bucket-join, Jaccard verify — replays in SQL. 8 bands × 4 rows
    // reuses the d9 32-seed family. Bounded to ids < 500 (corpus
    // < 400, increment 400-499) like d2, so the oracle's self-join
    // stays cheap at every SF on this pathologically self-similar
    // corpus.
    Q("d12_incremental_neardup", {
      val seedRows = Dedup.minhashCoeffs(32).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' '))) AS tok
         |  FROM documents),
         |h AS (SELECT doc_id,
         |        CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 2147483648 AS hc
         |      FROM toks),
         |seeds(i, a, b) AS (VALUES $seedRows),
         |m AS (SELECT doc_id, i, min((hc * a + b) % 2147483647) AS mh
         |      FROM h CROSS JOIN seeds WHERE doc_id < 500 GROUP BY doc_id, i),
         |bt AS (SELECT doc_id, i // 4 AS band,
         |              string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bucket
         |       FROM m GROUP BY doc_id, i // 4),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM bt x JOIN bt y ON x.band = y.band AND x.bucket = y.bucket
         |                      AND x.doc_id < y.doc_id
         |  WHERE x.doc_id >= 400 OR y.doc_id >= 400),
         |t AS (SELECT doc_id, list_distinct(string_split(trim(text), ' ')) AS tk
         |      FROM documents WHERE doc_id < 500)
         |SELECT c.id_a, c.id_b,
         |       len(list_intersect(a.tk, b.tk)) /
         |       (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) AS jaccard
         |FROM cand c
         |JOIN t a ON c.id_a = a.doc_id
         |JOIN t b ON c.id_b = b.doc_id
         |WHERE len(list_intersect(a.tk, b.tk)) /
         |      (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) >= 0.8"""
        .stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
      Dedup.minhashLshPairsIncremental(
        docs.filter(col("doc_id") < 400),
        docs.filter(col("doc_id") >= 400),
        "doc_id", "text", threshold = 0.8,
        bands = 8, rowsPerBand = 4, portable = true)
    },

    // END-TO-END near-dup corpus rewrite — THE nightly production
    // composition, under one gate: portable MinHash-LSH pairs (d9's
    // md5 seed family, raw band-slice buckets) → connected components
    // (d8's min-label semantics) → keep the (n_chars, doc_id)-max
    // member per group (the groupcover preference discipline) → one
    // (doc_id, group_id, kept) row per document. The oracle replays
    // EVERY stage: signature, banding, candidate bucket-join, Jaccard
    // verify, recursive-CTE transitive closure, canonical window.
    // Bounded to doc_id < 500 like d12 so the oracle's closure stays
    // cheap on this pathologically self-similar corpus at every SF.
    Q("pipe19_neardup_rewrite", {
      val seedRows = Dedup.minhashCoeffs(32).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' '))) AS tok
         |  FROM documents WHERE doc_id < 500),
         |h AS (SELECT doc_id,
         |        CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 2147483648 AS hc
         |      FROM toks),
         |seeds(i, a, b) AS (VALUES $seedRows),
         |m AS (SELECT doc_id, i, min((hc * a + b) % 2147483647) AS mh
         |      FROM h CROSS JOIN seeds GROUP BY doc_id, i),
         |bt AS (SELECT doc_id, i // 4 AS band,
         |              string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bucket
         |       FROM m GROUP BY doc_id, i // 4),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM bt x JOIN bt y ON x.band = y.band AND x.bucket = y.bucket
         |                      AND x.doc_id < y.doc_id),
         |t AS (SELECT doc_id, list_distinct(string_split(trim(text), ' ')) AS tk
         |      FROM documents WHERE doc_id < 500),
         |p AS (SELECT c.id_a, c.id_b
         |      FROM cand c
         |      JOIN t a ON c.id_a = a.doc_id
         |      JOIN t b ON c.id_b = b.doc_id
         |      WHERE len(list_intersect(a.tk, b.tk)) /
         |            (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) >= 0.8),
         |edges AS (SELECT id_a AS s, id_b AS d FROM p
         |          UNION SELECT id_b, id_a FROM p),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |grp AS (SELECT s AS doc_id, least(s, min(d)) AS g
         |        FROM reach GROUP BY s),
         |alld AS (SELECT d.doc_id, coalesce(grp.g, d.doc_id) AS group_id,
         |                d.n_chars
         |         FROM (SELECT doc_id, n_chars FROM documents
         |               WHERE doc_id < 500) d
         |         LEFT JOIN grp USING (doc_id))
         |SELECT doc_id, group_id,
         |       row_number() OVER (PARTITION BY group_id
         |         ORDER BY n_chars DESC, doc_id DESC) = 1 AS kept
         |FROM alld""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        threshold = 0.8, bands = 8, rowsPerBand = 4, portable = true)
      Dedup.nearDupRewrite(docs, "doc_id", col("n_chars"), pairs)
    },

    // Duplicate-group clustering: connected components over the exact
    // Jaccard pair graph (bounded subset so the oracle's recursive-CTE
    // transitive closure stays cheap). The Spark side is the iterative
    // min-label propagation a 100 TB dedup ends with.
    Q("d8_dup_groups",
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, list_distinct(string_split(trim(text), ' ')) AS toks
        |  FROM documents WHERE doc_id < 100),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.toks, b.toks)) /
        |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.85),
        |edges AS (SELECT id_a AS s, id_b AS d FROM p
        |          UNION SELECT id_b, id_a FROM p),
        |reach(s, d) AS (
        |  SELECT s, d FROM edges
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
        |SELECT s AS doc_id, least(s, min(d)) AS group_id
        |FROM reach GROUP BY s""".stripMargin) { (s, d) =>
      val pairs = Dedup.jaccardPairsExact(
        Tables.documents(s, d).filter(col("doc_id") < 100), "doc_id", "text", 0.85)
      Dedup.duplicateGroups(pairs)
        .select(col("node").as("doc_id"), col("group").as("group_id"))
    },

    // SimHash fingerprints (rows-only: xxhash64 family).
    Q.rowsOnly("d4_simhash") { (s, d) =>
      Dedup.simhashTable(Tables.documents(s, d), "doc_id", "text", 32)
        .withColumnRenamed("simhash", "simhash32")
    },

    // Portable SimHash (md5-derived token bits) — fully oracle-checked:
    // both engines vote per bit over the multiset of tokens.
    Q("d5_simhash_portable",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id,
        |        CAST(('0x' || substr(md5(tok), 1, 10)) AS BIGINT) AS th
        |      FROM toks),
        |votes AS (
        |  SELECT doc_id, b.j,
        |         sum(CASE WHEN (th >> b.j) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN (SELECT unnest(range(0, 16)) AS j) b
        |  GROUP BY doc_id, b.j)
        |SELECT doc_id,
        |       CAST(sum(CASE WHEN v > 0 THEN 1 << j ELSE 0 END) AS BIGINT)
        |         AS simhash16
        |FROM votes GROUP BY doc_id""".stripMargin) { (s, d) =>
      Dedup.simhashTable(Tables.documents(s, d), "doc_id", "text", 16,
          portable = true)
        .withColumnRenamed("simhash", "simhash16")
    },

    // SimHash bit-block near-dup pairs over the portable fingerprint —
    // candidates from block agreement (pigeonhole: Hamming ≤ 2 over 4
    // blocks forces ≥1 equal block), verified by bit_count(xor). Fully
    // oracle-checked end to end, including the bucket cap (block buckets
    // larger than 200 distinct docs are dropped on BOTH sides — the
    // production skew guard against boilerplate-heavy shards at scale).
    // 32-bit fingerprints / 8-bit blocks:
    // the block-value space (256 per position) is what keeps bucket
    // sizes — and candidate fan-out — sublinear as the corpus grows
    // (4-bit blocks have 16 values and collapse to near-all-pairs).
    Q("d10_simhash_neardup",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id,
        |        CAST(('0x' || substr(md5(tok), 1, 10)) AS BIGINT) AS th
        |      FROM toks),
        |votes AS (
        |  SELECT doc_id, b.j,
        |         sum(CASE WHEN (th >> b.j) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS j) b
        |  GROUP BY doc_id, b.j),
        |f AS (SELECT doc_id,
        |        CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END)
        |          AS BIGINT) AS fp
        |      FROM votes GROUP BY doc_id),
        |blk AS (SELECT doc_id, fp, b.j AS blk_idx, (fp >> (b.j * 8)) & 255 AS blk
        |        FROM f CROSS JOIN (SELECT unnest(range(0, 4)) AS j) b),
        |ok AS (SELECT blk_idx, blk FROM blk GROUP BY blk_idx, blk
        |       HAVING count(DISTINCT doc_id) <= 200),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        |         FROM blk a JOIN blk c
        |           ON a.blk_idx = c.blk_idx AND a.blk = c.blk
        |              AND a.doc_id < c.doc_id
        |         JOIN ok ON ok.blk_idx = a.blk_idx AND ok.blk = a.blk)
        |SELECT id_a, id_b,
        |       CAST(bit_count(CAST(xor(fa.fp, fb.fp) AS BIGINT)) AS INT) AS hamming
        |FROM cand JOIN f fa ON cand.id_a = fa.doc_id
        |          JOIN f fb ON cand.id_b = fb.doc_id
        |WHERE bit_count(CAST(xor(fa.fp, fb.fp) AS BIGINT)) <= 2""".stripMargin) { (s, d) =>
      Dedup.simhashNearDupPairs(Tables.documents(s, d), "doc_id", "text",
        bits = 32, blocks = 4, maxHamming = 2, portable = true,
        maxBucketSize = Some(200))
    },

    // Embedding-cosine near-dup, exact on an id-bounded subset (oracle
    // baseline; sim computed in double in both engines and rounded).
    // Threshold 0.4, not the 0.55 a prod near-dup pass would use: the
    // synthetic embeddings are near-orthogonal (max pairwise cosine
    // ≈ 0.46 in this subset), so 0.55 would hash-gate an empty result.
    Q("d6_embedding_neardup",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 300)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(a.v, b.v), 4) AS sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.4""".stripMargin) { (s, d) =>
      Dedup.embeddingNearDupPairsExact(
        Tables.embeddings(s, d).filter(col("vec_id") < 300),
        "vec_id", "embedding", 0.4)
    },

    // Scale path: LSH-bucketed embedding near-dup (rows-only).
    // Threshold 0.4 like d6 (the synthetic embeddings are
    // near-orthogonal — r15's 0.55 correctly returned ZERO pairs, so
    // the rows-only gate exercised nothing downstream of the buckets);
    // exactness of this family is oracle-pinned via the d13 twin.
    Q.rowsOnly("d7_embedding_neardup_lsh") { (s, d) =>
      Dedup.embeddingNearDupPairsLsh(Tables.embeddings(s, d),
        "vec_id", "embedding", 0.4)
    },

    // d7's portable twin, fully oracle-checked (the d5/d9 pattern):
    // md5-parity hyperplane signs + integer-quantized components
    // (floor(x·1000+0.5)) make the bucketing decision exact integer
    // math in both engines; candidates come from the same
    // (table, bucket) equi-join and verify with the same exact cosine
    // as d6. Bounded like d6 so the oracle's candidate self-join stays
    // cheap at every SF. planes=4 / threshold=0.3 because the synthetic
    // embeddings are near-orthogonal (max pairwise cosine ≈ 0.46 in the
    // bounded subset): 8 planes at 0.55 would gate an EMPTY result —
    // these settings keep ~200 rows under the hash at sf0.01.
    Q("d13_embedding_neardup_lsh_portable",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 300),
        |w AS (SELECT vec_id,
        |        list_transform(v, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS wv
        |      FROM e),
        |grid AS (SELECT t.t, p.p
        |         FROM (SELECT unnest(range(0, 6)) AS t) t
        |         CROSS JOIN (SELECT unnest(range(0, 4)) AS p) p),
        |signs AS (SELECT t, p,
        |            list_transform(range(0, 64), i -> CASE
        |              WHEN CAST(('0x' || substr(md5(
        |                     CAST(t AS VARCHAR) || ',' || CAST(p AS VARCHAR)
        |                       || ',' || CAST(i AS VARCHAR)), 1, 1)) AS BIGINT)
        |                   % 2 = 1
        |              THEN 1 ELSE -1 END) AS s
        |          FROM grid),
        |dots AS (SELECT w.vec_id, g.t, g.p,
        |           list_sum(list_transform(range(0, 64),
        |             i -> wv[i + 1] * g.s[i + 1])) AS dot
        |         FROM w CROSS JOIN signs g),
        |bk AS (SELECT vec_id, t,
        |         sum(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS bkt
        |       FROM dots GROUP BY vec_id, t),
        |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |         FROM bk a JOIN bk b
        |           ON a.t = b.t AND a.bkt = b.bkt AND a.vec_id < b.vec_id)
        |SELECT c.id_a, c.id_b,
        |       round(list_cosine_similarity(ea.v, eb.v), 4) AS sim
        |FROM cand c
        |JOIN e ea ON c.id_a = ea.vec_id
        |JOIN e eb ON c.id_b = eb.vec_id
        |WHERE list_cosine_similarity(ea.v, eb.v) >= 0.3""".stripMargin) {
      (s, d) =>
      Dedup.embeddingNearDupPairsLshPortable(
        Tables.embeddings(s, d).filter(col("vec_id") < 300),
        "vec_id", "embedding", 0.3, planes = 4)
    },

    // The INCREMENTAL embedding near-dup under a full oracle — the
    // nightly media-ingest operator (corpus buckets standing, only
    // the increment stages and pairs) in its portable-bucket form.
    // The oracle is d13's complete LSH replay (quantized sign test,
    // md5 hyperplanes, bucket equi-join, exact cosine verify) plus the
    // increment restriction: incremental output ≡ the full pair set
    // restricted to increment-touching pairs (DedupSpec pins that
    // equality on the native path too), so a lost touched-bucket, a
    // leaked corpus×corpus pair, or a wrong gate hash-diverges.
    Q("d19_embedding_incremental_portable",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 300),
        |w AS (SELECT vec_id,
        |        list_transform(v, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS wv
        |      FROM e),
        |grid AS (SELECT t.t, p.p
        |         FROM (SELECT unnest(range(0, 6)) AS t) t
        |         CROSS JOIN (SELECT unnest(range(0, 4)) AS p) p),
        |signs AS (SELECT t, p,
        |            list_transform(range(0, 64), i -> CASE
        |              WHEN CAST(('0x' || substr(md5(
        |                     CAST(t AS VARCHAR) || ',' || CAST(p AS VARCHAR)
        |                       || ',' || CAST(i AS VARCHAR)), 1, 1)) AS BIGINT)
        |                   % 2 = 1
        |              THEN 1 ELSE -1 END) AS s
        |          FROM grid),
        |dots AS (SELECT w.vec_id, g.t, g.p,
        |           list_sum(list_transform(range(0, 64),
        |             i -> wv[i + 1] * g.s[i + 1])) AS dot
        |         FROM w CROSS JOIN signs g),
        |bk AS (SELECT vec_id, t,
        |         sum(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS bkt
        |       FROM dots GROUP BY vec_id, t),
        |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |         FROM bk a JOIN bk b
        |           ON a.t = b.t AND a.bkt = b.bkt AND a.vec_id < b.vec_id)
        |SELECT c.id_a, c.id_b,
        |       round(list_cosine_similarity(ea.v, eb.v), 4) AS sim
        |FROM cand c
        |JOIN e ea ON c.id_a = ea.vec_id
        |JOIN e eb ON c.id_b = eb.vec_id
        |WHERE list_cosine_similarity(ea.v, eb.v) >= 0.3
        |  AND (c.id_a % 4 = 0 OR c.id_b % 4 = 0)""".stripMargin) {
      (s, d) =>
      val emb = Tables.embeddings(s, d).filter(col("vec_id") < 300)
      Dedup.embeddingNearDupPairsIncremental(
        emb.filter(col("vec_id") % 4 =!= 0),
        emb.filter(col("vec_id") % 4 === 0),
        "vec_id", "embedding", 0.3, planes = 4, portable = true)
    },

    // SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup —
    // k-means buckets the corpus, pairwise cosine runs only WITHIN a
    // cluster, and each near-dup pair drops its (centroid_sim, id)-
    // larger member (the paper keeps the LEAST-central example).
    // Production shape: Lloyd trains on a deterministic ~25% hash
    // sample, the full corpus is assigned in one broadcast pass, and
    // the same centroid table serves the IVF index (e7) and this
    // dedup. Rows-only — cluster membership is training-dependent;
    // the full math is under d18's oracle and the production↔twin
    // drift is pinned by TwinConsistencySpec. Threshold 0.35, not the
    // ~0.95 production semdedup uses: these synthetic embeddings are
    // near-orthogonal (d6's note), so 0.95 would gate a no-drop run.
    Q.rowsOnly("d17_semdedup") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.kmeansCentroidsLocal(
        graft.llm.Corpus.hashSample(emb, "vec_id", 25, "semdedup"),
        "vec_id", "embedding", k = 8, iters = 3)
      val assign = Similarity.assignToCentroids(emb, "vec_id", "embedding",
        cents)
      Dedup.semDedup(emb, "vec_id", "embedding", assign, cents,
        threshold = 0.35)
    },

    // d17's portable twin (the e11 discipline): the ENTIRE semdedup
    // path — seed selection (k smallest ids at iters = 1), the
    // broadcast-centroid min_by assignment with its lpad tie-break,
    // per-member centroid similarity, within-cluster pair cosine at
    // the threshold, and the (centroid_sim, id) drop rule — under the
    // DuckDB hash oracle. Inputs are integer-quantized
    // (floor(x·1000 + 0.5), cast back to float — exact: |x·1000| ≪
    // 2²⁴), so every cosine is exact integer sums + one division +
    // IEEE sqrt, bit-identical in both engines; the oracle replays
    // Spark's cosine FORMULA (dot / (√Σa²·√Σb²)), not a builtin.
    Q("d18_semdedup_portable",
      """WITH e AS (SELECT vec_id,
        |             list_transform(CAST(embedding AS DOUBLE[]),
        |                            x -> floor(x * 1000 + 0.5)) AS v
        |           FROM embeddings),
        |sc AS (SELECT CAST(vec_id AS VARCHAR) AS cluster, v AS centroid
        |       FROM e ORDER BY vec_id LIMIT 8),
        |asg AS (SELECT vec_id, cluster FROM (
        |          SELECT e.vec_id, sc.cluster, row_number() OVER (
        |            PARTITION BY e.vec_id ORDER BY
        |              (list_sum(list_transform(range(0, 64),
        |                 i -> e.v[i+1] * sc.centroid[i+1]))
        |               / (sqrt(list_sum(list_transform(e.v, x -> x * x))) *
        |                  sqrt(list_sum(list_transform(sc.centroid,
        |                    x -> x * x))))) DESC,
        |              lpad(cluster, 24, '0')) AS rn
        |          FROM e CROSS JOIN sc) WHERE rn = 1),
        |cs AS (SELECT a.vec_id, a.cluster,
        |         (list_sum(list_transform(range(0, 64),
        |            i -> e.v[i+1] * sc.centroid[i+1]))
        |          / (sqrt(list_sum(list_transform(e.v, x -> x * x))) *
        |             sqrt(list_sum(list_transform(sc.centroid,
        |               x -> x * x))))) AS csim
        |       FROM asg a JOIN e ON e.vec_id = a.vec_id
        |                  JOIN sc ON sc.cluster = a.cluster),
        |drp AS (
        |  SELECT DISTINCT CASE WHEN x.csim > y.csim
        |                         OR (x.csim = y.csim AND x.vec_id > y.vec_id)
        |                       THEN x.vec_id ELSE y.vec_id END AS vec_id
        |  FROM cs x JOIN cs y
        |    ON x.cluster = y.cluster AND x.vec_id < y.vec_id
        |  JOIN e ex ON ex.vec_id = x.vec_id
        |  JOIN e ey ON ey.vec_id = y.vec_id
        |  WHERE (list_sum(list_transform(range(0, 64),
        |           i -> ex.v[i+1] * ey.v[i+1]))
        |         / (sqrt(list_sum(list_transform(ex.v, x -> x * x))) *
        |            sqrt(list_sum(list_transform(ey.v, x -> x * x)))))
        |        >= 0.35)
        |SELECT cs.vec_id, cs.cluster,
        |       round(cs.csim, 4) + 0.0 AS centroid_sim,
        |       cs.vec_id NOT IN (SELECT vec_id FROM drp) AS keep
        |FROM cs""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000 + 0.5).cast("float")).as("qv"))
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "qv",
        k = 8, iters = 1)
      val assign = Similarity.assignToCentroids(emb, "vec_id", "qv", cents)
      Dedup.semDedup(emb, "vec_id", "qv", assign, cents, threshold = 0.35)
    },

    // Cluster-balanced corpus selection — the semantic-diversity
    // balancing step of modern curation pipelines (cap every semantic
    // cluster at a quota so no mode dominates; the embedding-space
    // analog of c5's per-language cap): k-means cluster assignment →
    // per-cluster deterministic stable-hash quota. Composed from the
    // d18 assignment (quantized, iters = 1, seed centroids) and the c5
    // quota, so the ENTIRE pipeline — seeding, assignment, hash order,
    // cut — replays under the DuckDB oracle.
    Q("pipe18_cluster_balance",
      """WITH e AS (SELECT vec_id,
        |             list_transform(CAST(embedding AS DOUBLE[]),
        |                            x -> floor(x * 1000 + 0.5)) AS v
        |           FROM embeddings),
        |sc AS (SELECT CAST(vec_id AS VARCHAR) AS cluster, v AS centroid
        |       FROM e ORDER BY vec_id LIMIT 8),
        |asg AS (SELECT vec_id, cluster FROM (
        |          SELECT e.vec_id, sc.cluster, row_number() OVER (
        |            PARTITION BY e.vec_id ORDER BY
        |              (list_sum(list_transform(range(0, 64),
        |                 i -> e.v[i+1] * sc.centroid[i+1]))
        |               / (sqrt(list_sum(list_transform(e.v, x -> x * x))) *
        |                  sqrt(list_sum(list_transform(sc.centroid,
        |                    x -> x * x))))) DESC,
        |              lpad(cluster, 24, '0')) AS rn
        |          FROM e CROSS JOIN sc) WHERE rn = 1)
        |SELECT vec_id, cluster FROM (
        |  SELECT vec_id, cluster, row_number() OVER (
        |    PARTITION BY cluster ORDER BY
        |      CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':bal'),
        |        1, 10)) AS BIGINT), vec_id) AS rk
        |  FROM asg) WHERE rk <= 30""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000 + 0.5).cast("float")).as("qv"))
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "qv",
        k = 8, iters = 1)
      val assign = Similarity.assignToCentroids(emb, "vec_id", "qv", cents)
      graft.llm.Corpus.stratifiedQuota(assign, "vec_id", "cluster",
        30, "bal").select("vec_id", "cluster")
    },

    // Cross-document repeated passages (substring-granularity dedup,
    // Lee et al. 2021 approximated at token-window resolution): 8-token
    // windows, stride 1, hashes shared by >= 2 distinct docs. The md5
    // portable core keeps the whole path — windowing, hashing, the
    // distinct-doc count — under the oracle; production uses the
    // xxhash64 core on the same plan.
    Q("d15_repeated_passages",
      """WITH base AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
        |win AS (
        |  SELECT doc_id, unnest(CASE WHEN len(t) >= 8 THEN
        |      list_transform(range(0, len(t) - 7),
        |                     i -> array_to_string(t[i+1:i+8], ' '))
        |    ELSE []::VARCHAR[] END) AS p
        |  FROM base),
        |h AS (SELECT doc_id, p,
        |        CAST(('0x' || substr(md5(p), 1, 8)) AS BIGINT)
        |          % 2147483648 AS h
        |      FROM win)
        |SELECT h AS passage_hash, count(DISTINCT doc_id) AS n_docs,
        |       count(*) AS n_occ, min(p) AS sample
        |FROM h GROUP BY h HAVING count(DISTINCT doc_id) >= 2""".stripMargin) {
      (s, d) =>
      Dedup.repeatedPassages(Tables.documents(s, d), "doc_id", "text",
        w = 8, stride = 1, minDocs = 2, portable = true)
    },

    // Per-document repeated-passage coverage + RefinedWeb-style keep
    // decision, at stride 4 (the tiling knob the scale path uses: 4×
    // less window volume than d15's stride 1). Docs shorter than the
    // window emit no windows and keep with 0.0 coverage.
    Q("d16_passage_coverage",
      """WITH base AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
        |win AS (
        |  SELECT doc_id, unnest(CASE WHEN len(t) >= 8 THEN
        |      list_transform(range(0, (len(t) - 8) // 4 + 1),
        |                     i -> array_to_string(t[i*4+1:i*4+8], ' '))
        |    ELSE []::VARCHAR[] END) AS p
        |  FROM base),
        |hh AS (SELECT doc_id,
        |         CAST(('0x' || substr(md5(p), 1, 8)) AS BIGINT)
        |           % 2147483648 AS wh
        |       FROM win),
        |rep AS (SELECT wh FROM hh GROUP BY wh
        |        HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (SELECT hh.doc_id, count(*) AS n_windows,
        |          count(rep.wh) AS n_repeated
        |        FROM hh LEFT JOIN rep ON hh.wh = rep.wh
        |        GROUP BY hh.doc_id)
        |SELECT d.doc_id AS doc,
        |  coalesce(cov.n_windows, 0) AS n_windows,
        |  coalesce(cov.n_repeated, 0) AS n_repeated,
        |  CASE WHEN coalesce(cov.n_windows, 0) > 0
        |       THEN CAST(cov.n_repeated AS DOUBLE) / cov.n_windows
        |       ELSE 0.0 END AS repeated_frac,
        |  (CASE WHEN coalesce(cov.n_windows, 0) > 0
        |        THEN CAST(cov.n_repeated AS DOUBLE) / cov.n_windows
        |        ELSE 0.0 END <= 0.5) AS keep
        |FROM documents d LEFT JOIN cov ON d.doc_id = cov.doc_id""".stripMargin) {
      (s, d) =>
      Dedup.passageCoverage(Tables.documents(s, d), "doc_id", "text",
        w = 8, stride = 4, minDocs = 2, threshold = 0.5, portable = true)
    },

    // The passage-family REWRITE (Lee et al. exact-substring removal
    // at token-window resolution): every token covered by a cross-doc
    // repeated window is cut, producing the scrubbed corpus d15/d16
    // only detect. text_scrubbed is the token-normalized rewrite;
    // the empty rewrite coalesces to '' (DuckDB's array_to_string of
    // an empty list is NULL, Spark's array_join is '').
    Q("pipe22_passage_scrub",
      """WITH base AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
        |win AS (
        |  SELECT doc_id, t, unnest(CASE WHEN len(t) >= 8
        |      THEN range(0, len(t) - 7) ELSE []::BIGINT[] END) AS pos
        |  FROM base),
        |hh AS (SELECT doc_id, pos,
        |        CAST(('0x' || substr(md5(
        |            array_to_string(t[pos+1:pos+8], ' ')), 1, 8)) AS BIGINT)
        |          % 2147483648 AS h
        |       FROM win),
        |rep AS (SELECT h FROM hh GROUP BY h
        |        HAVING count(DISTINCT doc_id) >= 2),
        |cvr AS (SELECT hh.doc_id, unnest(range(hh.pos, hh.pos + 8)) AS cp
        |        FROM hh JOIN rep USING (h)),
        |cov AS (SELECT doc_id, list(DISTINCT cp) AS cov FROM cvr
        |        GROUP BY doc_id),
        |kept AS (
        |  SELECT b.doc_id, b.t, len(b.t) AS n_tokens,
        |         list_filter(range(0, len(b.t)),
        |           p -> NOT list_contains(coalesce(c.cov, []::BIGINT[]), p))
        |           AS kp
        |  FROM base b LEFT JOIN cov c USING (doc_id))
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(n_tokens - len(kp) AS BIGINT) AS n_removed,
        |       coalesce(array_to_string(
        |         list_transform(kp, p -> t[p+1]), ' '), '') AS text_scrubbed
        |FROM kept""".stripMargin) { (s, d) =>
      Dedup.passageScrub(Tables.documents(s, d), "doc_id", "text",
        w = 8, stride = 1, minDocs = 2, portable = true)
    },

    // BPE tokenizer training (Sennrich et al. 2016): six merge rounds
    // over the corpus' word-count vocabulary, fully replayed by the
    // oracle — each unrolled round re-derives weighted pair counts,
    // the deterministic arg-max, and the greedy non-overlapping
    // rewrite (resolved as odd-parity positions within consecutive-
    // match runs, the SQL-expressible equivalent of the fold).
    Q("t13_bpe_train", bpeOracleSql(6)) { (s, d) =>
      TextAnalysis.bpeTrain(Tables.documents(s, d), "doc_id", "text",
        merges = 6)
    },

    // Tokenize the corpus under the TRAINED vocabulary: per-doc BPE
    // token counts — the budget input sequence packing (c4/c7)
    // consumes. Same training chain as t13, but SERVED from a
    // persisted TokenizerStore (train → write → read-verify →
    // broadcast join), the e14/c11 "store round-trip invisible"
    // pattern: the oracle is the direct train+serve SQL verbatim.
    Q("t14_bpe_tokens", bpeTokensOracleSql(6)) { (s, d) =>
      val dir = Fixtures.stampedDir(d, "documents", "bpe_store", 1)
        .resolve("tok").toString
      val params = TokenizerStore.Params(merges = 6, minCount = 1L)
      if (TokenizerStore.readParams(s, dir).isEmpty)
        TokenizerStore.build(Tables.documents(s, d), "doc_id", "text",
          dir, params)
      TokenizerStore.tokenCounts(s, dir, params,
        Tables.documents(s, d), "doc_id", "text")
    },

    // The per-symbol TOKEN-ID stream — the actual model input t14's
    // budgets meter: (doc, word position, symbol position, symbol,
    // dense id), ids = 1-based binary-order ranks of the trained
    // symbol set (a pure function of the artifact; the oracle
    // re-derives the same table from the replayed train chain). The
    // whole encode is served from the persisted TokenizerStore.
    Q("t15_token_ids",
      s"""${LlmQueries.tokenIdsChainSql(6)}
         |SELECT t2.doc_id, CAST(t2.wpos AS INT) AS wpos,
         |       CAST(t2.spos AS INT) AS spos, t2.sym,
         |       coalesce(v.token_id, 0) AS token_id
         |FROM ts2 t2 LEFT JOIN vocab v USING (sym)""".stripMargin) { (s, d) =>
      val dir = Fixtures.stampedDir(d, "documents", "bpe_store", 1)
        .resolve("tok").toString
      val params = TokenizerStore.Params(merges = 6, minCount = 1L)
      if (TokenizerStore.readParams(s, dir).isEmpty)
        TokenizerStore.build(Tables.documents(s, d), "doc_id", "text",
          dir, params)
      TokenizerStore.tokenIds(s, dir, params,
        Tables.documents(s, d), "doc_id", "text")
    },

    // Token counting + lexical stats per document.
    Q("t1_token_stats",
      """SELECT doc_id,
        |       CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS n_distinct,
        |       len(list_distinct(string_split(trim(text), ' '))) /
        |       len(string_split(trim(text), ' ')) AS distinct_ratio
        |FROM documents""".stripMargin) { (s, d) =>
      val t = Scalars.tokens(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"),
        size(t).cast("long").as("n_tokens"),
        size(array_distinct(t)).cast("long").as("n_distinct"),
        TextAnalysis.distinctRatio(col("text")).as("distinct_ratio"))
    },

    // Quality scoring — identical IEEE arithmetic on both sides (raw
    // integer-ratio terms, same operation order, no rounding — round()
    // tie-breaking is engine-specific), so the doubles match
    // bit-for-bit.
    Q("t2_quality_score",
      s"""SELECT doc_id,
         |  CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE
         |  (len(list_distinct(toks)) / len(toks)) * 0.5
         |  + (1.0 - (length(text) - length(regexp_replace(text, '[^\\p{L}\\p{N}\\s]', '', 'g')))
         |           / greatest(length(text), 1)) * 0.3
         |  + (1.0 - len(list_filter(toks, t -> list_contains(${sqlList(TextAnalysis.EnStopwords)}, t)))
         |           / len(toks)) * 0.2
         |  END AS quality
         |FROM (SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM documents)""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
    },

    // Language-ID via the (data-driven) stopword profiles + Han-script
    // pre-check; the oracle renders the SAME profile lists from
    // TextAnalysis.LangProfiles, so profile swaps can't silently
    // diverge the two sides.
    Q("t3_lang_id",
      s"""SELECT doc_id,
         |  CASE WHEN tnull THEN NULL
         |       WHEN has_han THEN 'zh'
         |       WHEN best = 0 THEN 'und'
         |       WHEN h_fr = best THEN 'fr' WHEN h_es = best THEN 'es'
         |       WHEN h_en = best THEN 'en' ELSE 'de' END AS lang_pred
         |FROM (
         |  SELECT doc_id, tnull, has_han,
         |         greatest(h_en, h_de, h_fr, h_es) AS best,
         |         h_en, h_de, h_fr, h_es
         |  FROM (SELECT doc_id, tnull, has_han,
         |    ${langHitsSql("en")} AS h_en, ${langHitsSql("de")} AS h_de,
         |    ${langHitsSql("fr")} AS h_fr, ${langHitsSql("es")} AS h_es
         |    FROM (SELECT doc_id, text IS NULL AS tnull,
         |          coalesce(regexp_matches(text, '\\p{Han}'), false) AS has_han,
         |          string_split(trim(text), ' ') AS toks FROM documents)))""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
    },

    // Document fingerprint (portable md5 — oracle-checked).
    Q("t4_fingerprint",
      """SELECT doc_id,
        |       md5(array_to_string(list_sort(string_split(trim(text), ' ')), ' ')) AS fp
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    },

    // BPE-ish subword token counting (token-cost estimation).
    Q("t5_bpeish_token_count",
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.BpeishPattern}')) AS BIGINT)
         |    AS bpeish_tokens
         |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("bpeish_tokens"))
    },

    // Rolling-hash (order-sensitive) document fingerprint. Both engines
    // fold (acc*31 + md5-derived 40-bit token hash) mod 2^40; DuckDB's
    // 2-arg list_reduce seeds with the first element, which equals
    // Spark's 0-seeded fold because v1 < 2^40.
    Q("t6_rolling_fingerprint",
      """SELECT doc_id,
        |  list_reduce(
        |    list_transform(string_split(trim(text), ' '),
        |                   x -> CAST(('0x' || substr(md5(x), 1, 10)) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1099511627776) AS rolling_fp
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.rollingFingerprint(col("text")).as("rolling_fp"))
    },

    // Gopher-style repetition filters: top-token share + duplicate
    // 2/3-gram fractions + the keep gate, all per-row expressions
    // inside the scan (zero shuffle — documents are bounded-length, so
    // the per-row quadratic is linear overall). Raw integer-ratio
    // doubles, identical operation order on both engines, no round().
    Q("t7_repetition",
      """WITH base AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS toks
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) >= 2 THEN
        |      list_transform(range(1, len(toks)),
        |                     i -> array_to_string(toks[i:i+1], ' '))
        |      ELSE []::VARCHAR[] END AS g2,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |                     i -> array_to_string(toks[i:i+2], ' '))
        |      ELSE []::VARCHAR[] END AS g3
        |  FROM base),
        |m AS (
        |  SELECT doc_id,
        |    list_aggregate(list_transform(list_distinct(toks),
        |      d -> len(list_filter(toks, x -> x = d))), 'max')
        |      / len(toks) AS top_token_frac,
        |    CASE WHEN len(g2) = 0 THEN 0.0
        |      ELSE (len(g2) - len(list_distinct(g2))) / len(g2)
        |      END AS dup_2gram_frac,
        |    CASE WHEN len(g3) = 0 THEN 0.0
        |      ELSE (len(g3) - len(list_distinct(g3))) / len(g3)
        |      END AS dup_3gram_frac
        |  FROM ng)
        |SELECT doc_id, top_token_frac, dup_2gram_frac, dup_3gram_frac,
        |  (top_token_frac <= 0.20 AND dup_2gram_frac <= 0.20
        |   AND dup_3gram_frac <= 0.18) AS keep
        |FROM m""".stripMargin) { (s, d) =>
      TextAnalysis.repetitionStats(Tables.documents(s, d), "text")
        .select("doc_id", "top_token_frac", "dup_2gram_frac",
          "dup_3gram_frac", "keep")
    },

    // Benchmark decontamination: per-doc distinct 5-gram overlap
    // against a held-out "benchmark" slice (ids ≡ 0 mod 37). The
    // benchmark n-gram set broadcasts; the corpus side explodes
    // distinct n-grams once and folds back with one doc-keyed agg —
    // nothing pairwise. Benchmark members themselves score 1.0, which
    // also pins the threshold gate.
    Q("t8_contamination",
      """WITH sh AS (
        |  SELECT doc_id, CASE WHEN len(t) >= 5 THEN
        |      list_distinct(list_transform(range(1, len(t) - 3),
        |        i -> array_to_string(t[i:i+4], ' ')))
        |    ELSE [] END AS gs
        |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS t
        |        FROM documents)),
        |bench AS (SELECT DISTINCT g FROM
        |  (SELECT unnest(gs) AS g FROM sh WHERE doc_id % 37 = 0)),
        |ex AS (SELECT doc_id, unnest(gs) AS g FROM sh),
        |m AS (SELECT e.doc_id, count(*) AS n, count(b.g) AS nm
        |      FROM ex e LEFT JOIN bench b ON e.g = b.g GROUP BY e.doc_id)
        |SELECT d.doc_id,
        |  coalesce(m.n, 0) AS n_ngrams,
        |  coalesce(m.nm, 0) AS n_matched,
        |  CASE WHEN coalesce(m.n, 0) > 0
        |       THEN CAST(m.nm AS DOUBLE) / m.n ELSE 0.0 END AS contamination,
        |  (CASE WHEN coalesce(m.n, 0) > 0
        |        THEN CAST(m.nm AS DOUBLE) / m.n ELSE 0.0 END >= 0.2)
        |    AS contaminated
        |FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id""".stripMargin) {
      (s, d) =>
      val docs = Tables.documents(s, d)
      TextAnalysis.contaminationStats(docs, "doc_id", "text",
          docs.filter(col("doc_id") % 37 === 0), "text",
          n = 5, threshold = 0.2)
        .select(col("doc_id"), col("n_ngrams"), col("n_matched"),
          col("contamination"), col("contaminated"))
    },

    // PII scrubbing: emails/IPv4s/phone numbers injected per-id-class
    // into the (digit-free) corpus text, counted on the original and
    // redacted in fixed order. Pure codegen'd projection.
    Q("t9_pii_scrub",
      """WITH p AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN ' Contact user' || doc_id || '@example.org now.'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0
        |         THEN ' Node 10.0.' || (doc_id % 256) || '.' || (doc_id % 200)
        |              || ' logged.' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |         THEN ' Call +49 341 ' || (100000 + doc_id) || ' today.'
        |         ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(t, '([0-9]{1,3}\.){3}[0-9]{1,3}'))
        |    AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(t, '\+?([0-9][ \t()-]{0,3}){8,}[0-9]'))
        |    AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
        |    '\+?([0-9][ \t()-]{0,3}){8,}[0-9]', '<PHONE>', 'g') AS scrubbed
        |FROM p""".stripMargin) { (s, d) =>
      val id = col("doc_id")
      def str(c: org.apache.spark.sql.Column) = c.cast("string")
      val t = concat(col("text"),
        when(id % 3 === 0,
          concat(lit(" Contact user"), str(id), lit("@example.org now.")))
          .otherwise(""),
        when(id % 4 === 0,
          concat(lit(" Node 10.0."), str(id % 256), lit("."), str(id % 200),
            lit(" logged."))).otherwise(""),
        when(id % 5 === 0,
          concat(lit(" Call +49 341 "), str(lit(100000) + id), lit(" today.")))
          .otherwise(""))
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.piiCount(t, TextAnalysis.EmailRe).as("n_emails"),
        TextAnalysis.piiCount(t, TextAnalysis.Ipv4Re).as("n_ips"),
        TextAnalysis.piiCount(t, TextAnalysis.PhoneRe).as("n_phones"),
        TextAnalysis.piiScrub(t).as("scrubbed"))
    },

    // Gopher/MassiveText rule-based quality signals (word-count and
    // mean-word-length bounds, symbol-to-word ratio, bullet-/ellipsis-
    // line fractions, alphabetic-word fraction, distinct-stopword
    // floor). The corpus is single-line and symbol-free, so structure
    // is injected per id class (the t9 pattern): bullet lines,
    // an ellipsis line, a #-heavy heading line. The oracle splits
    // tokens on \s+ (newlines now separate tokens) and lines on
    // chr(10); every ratio is an integer/integer division so the
    // doubles are bit-stable across engines.
    Q("t10_gopher_quality",
      s"""WITH p AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 5 = 0
         |         THEN chr(10) || '- first item' || chr(10) || '- second item'
         |         ELSE '' END ||
         |    CASE WHEN doc_id % 4 = 0
         |         THEN chr(10) || 'to be continued ...' ELSE '' END ||
         |    CASE WHEN doc_id % 7 = 0
         |         THEN chr(10) || '### heading # notes …' ELSE '' END AS t
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, t,
         |         regexp_split_to_array(trim(t), '\\s+') AS toks,
         |         string_split(t, chr(10)) AS lines
         |  FROM p),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_words,
         |    list_aggregate(list_transform(toks, x -> length(x)), 'sum')
         |      / len(toks) AS mean_word_len,
         |    len(regexp_extract_all(t, '#|\\.\\.\\.|…')) / len(toks)
         |      AS symbol_word_ratio,
         |    len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))
         |      / len(lines) AS bullet_line_frac,
         |    len(list_filter(lines, l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$$')))
         |      / len(lines) AS ellipsis_line_frac,
         |    len(list_filter(toks, x -> regexp_matches(x, '\\p{L}')))
         |      / len(toks) AS alpha_word_frac,
         |    CAST(len(list_filter(list_distinct(toks),
         |      x -> list_contains(${sqlList(TextAnalysis.GopherStopwords)}, x)))
         |      AS BIGINT) AS stop_hits
         |  FROM s)
         |SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
         |  bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stop_hits,
         |  coalesce(n_words BETWEEN 50 AND 100000
         |    AND mean_word_len BETWEEN 3.0 AND 10.0
         |    AND symbol_word_ratio <= 0.1
         |    AND bullet_line_frac <= 0.9
         |    AND ellipsis_line_frac <= 0.3
         |    AND alpha_word_frac >= 0.8
         |    AND stop_hits >= 2, false) AS keep
         |FROM m""".stripMargin) { (s, d) =>
      val id = col("doc_id")
      val t = concat(col("text"),
        when(id % 5 === 0, lit("\n- first item\n- second item"))
          .otherwise(""),
        when(id % 4 === 0, lit("\nto be continued ...")).otherwise(""),
        when(id % 7 === 0, lit("\n### heading # notes …")).otherwise(""))
      TextAnalysis.gopherStats(
          Tables.documents(s, d).select(col("doc_id"), t.as("t")), "t")
        .select("doc_id", "n_words", "mean_word_len", "symbol_word_ratio",
          "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
          "stop_hits", "keep")
    },

    // HTML→text main-content extraction (the crawl front door; stage
    // contract in graft.plans.HtmlText). The fixture wraps each
    // document's text in a realistic page — head with title/style/
    // script, a nav link menu, a heading crumb, conditional list /
    // link-bearing / entity-bearing / comment-adjacent blocks, and an
    // unclosed-script tail every 11th doc (crawl truncation) — and
    // BOTH engines replay the identical stage chain on it. Registered
    // through the NATIVE single-pass expression, so the DuckDB hash
    // oracle gates the production code path directly (the declarative
    // twin is additionally spec-pinned equal in HtmlExtractSpec).
    Q("t16_html_extract", t16OracleSql) { (s, d) =>
      TextAnalysis.htmlExtractStats(
          Tables.documents(s, d).select(col("doc_id"), t16Html.as("html")),
          "html", native = true)
        .select("doc_id", "text", "n_lines_kept", "n_lines_dropped")
    },

    // URL normalization + registered-domain extraction (crawl
    // curation's per-domain key; contract in functions/Urls.scala).
    // The fixture synthesizes adversarial-but-real URL shapes from
    // doc_id: uppercase schemes/hosts, userinfo, default and
    // non-default ports, trailing-dot hosts, fragments, query
    // strings, and hosts across the public-suffix rule classes
    // (multi-label ccSLD, private registry, unknown single-label).
    Q("t17_url_normalize", t17OracleSql) { (s, d) =>
      import graft.functions.Urls
      Tables.documents(s, d)
        .select(col("doc_id"), t17Url.as("url"))
        .select(col("doc_id"),
          Urls.urlNormalize(col("url")).as("url_norm"),
          Urls.urlHost(col("url")).as("host"),
          Urls.urlRegisteredDomain(col("url")).as("domain"))
    },

    // Charset detection + repair (plans/TextDecodeExpr): crawl bodies
    // are routinely mislabeled, and a blind UTF-8 decode turns every
    // Latin-1 high byte into U+FFFD before the funnel ever sees the
    // text. The fixture ENCODES a non-ASCII suffix through both
    // charsets in-plan (Spark `encode`), so the operator must detect
    // well-formed-UTF-8 vs not and decode accordingly; the oracle
    // knows every expected string by construction and never touches
    // bytes.
    Q("t18_charset_decode",
      """SELECT doc_id, text || ' naïve café' AS text,
        |  CASE WHEN doc_id % 5 = 1 THEN 'utf-16be'
        |       WHEN doc_id % 3 = 0 THEN 'iso-8859-1'
        |       ELSE 'utf-8' END AS charset
        |FROM documents""".stripMargin) { (s, d) =>
      graft.plans.TextDecodeExpr.register(s)
      val suffixed = concat(col("text"), lit(" naïve café"))
      // Java's "UTF-16" charset writes a big-endian BOM — the
      // legacy-Windows page class the utf-16be branch detects.
      val payload = when(col("doc_id") % 5 === 1,
          encode(suffixed, "UTF-16"))
        .when(col("doc_id") % 3 === 0, encode(suffixed, "ISO-8859-1"))
        .otherwise(encode(suffixed, "UTF-8"))
      Tables.documents(s, d)
        .select(col("doc_id"), payload.as("p"))
        .withColumn("__d", explode(array(
          call_function(graft.plans.TextDecodeExpr.Name, col("p")))))
        .select(col("doc_id"), col("__d.text").as("text"),
          col("__d.charset").as("charset"))
    },

    // Legacy-CJK charset detection (the t18 seam filled: GBK /
    // Shift_JIS / EUC-JP / Big5 are a large share of real crawls, and
    // the Latin-1 fallback turned those pages into scoreable-looking
    // mojibake). The fixture appends a constant CJK suffix ENCODED
    // THROUGH EACH CODEPAGE (driver-side constant byte literals —
    // Spark's `encode` whitelists only the UTF family) onto the
    // UTF-8 ASCII body; the operator must route each payload through
    // the byte-shape probes + strict round-trip to the right branch,
    // including the contrast case of the SAME CJK text correctly
    // shipped as UTF-8. The oracle knows every decoded string by
    // construction and never touches bytes.
    Q("t19_charset_cjk",
      """SELECT doc_id,
        |  text || CASE WHEN doc_id % 5 IN (1, 2)
        |               THEN ' 日本語テキスト'
        |               WHEN doc_id % 5 = 3
        |               THEN ' 這是中文資料'
        |               ELSE ' 中文数据处理'
        |          END AS text,
        |  CASE WHEN doc_id % 5 = 1 THEN 'shift_jis'
        |       WHEN doc_id % 5 = 2 THEN 'euc-jp'
        |       WHEN doc_id % 5 = 3 THEN 'big5'
        |       WHEN doc_id % 5 = 4 THEN 'gbk'
        |       ELSE 'utf-8' END AS charset
        |FROM documents""".stripMargin) { (s, d) =>
      graft.plans.TextDecodeExpr.register(s)
      // Japanese (kana signal), traditional (low-trail signal),
      // simplified (GB2312-zone pairs) — one constant per codepage.
      val jp = "日本語テキスト"
      val trad = "這是中文資料"
      val simp = "中文数据处理"
      val suffix = when(col("doc_id") % 5 === 1,
          lit((" " + jp).getBytes("Shift_JIS")))
        .when(col("doc_id") % 5 === 2, lit((" " + jp).getBytes("EUC-JP")))
        .when(col("doc_id") % 5 === 3, lit((" " + trad).getBytes("Big5")))
        .when(col("doc_id") % 5 === 4, lit((" " + simp).getBytes("GBK")))
        .otherwise(lit((" " + simp).getBytes("UTF-8")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(encode(col("text"), "UTF-8"), suffix).as("p"))
        .withColumn("__d", explode(array(
          call_function(graft.plans.TextDecodeExpr.Name, col("p")))))
        .select(col("doc_id"), col("__d.text").as("text"),
          col("__d.charset").as("charset"))
    },

    // Linear quality-classifier inference (the fastText-style filter
    // serving shape, FineWeb-Edu / CCNet): hashed bag-of-words counts
    // × a broadcast integer-quantized weight table → exact integer
    // score per doc, positive = keep. The registered model is a
    // deterministic md5-derived weight table (what matters here is the
    // INFERENCE plan — one scan, one doc-keyed agg, broadcast model;
    // a trained model ships as the same (feature, w) table). Fully
    // oracle-checked: features, counts, weights, scores, decisions.
    Q("t11_classifier_score",
      """WITH base AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
        |  FROM documents),
        |f AS (SELECT doc_id,
        |        CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 1024 AS f
        |      FROM base),
        |dc AS (SELECT doc_id, f, count(*) AS c FROM f GROUP BY doc_id, f),
        |wts AS (SELECT f,
        |          CAST(('0x' || substr(md5('w' || CAST(f AS VARCHAR)), 1, 8))
        |            AS BIGINT) % 2001 - 1000 AS w
        |        FROM (SELECT unnest(range(0, 1024)) AS f)),
        |sc AS (SELECT dc.doc_id, CAST(sum(dc.c * wts.w) AS BIGINT) AS score
        |       FROM dc JOIN wts USING (f) GROUP BY dc.doc_id)
        |SELECT d.doc_id, coalesce(sc.score, 0) AS score,
        |       coalesce(sc.score, 0) > 0 AS positive
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN sc USING (doc_id)""".stripMargin) { (s, d) =>
      val wts = s.range(1024).select(col("id").as("feature"),
        (pmod(conv(substring(md5(concat(lit("w"), col("id").cast("string"))),
          1, 8), 16, 10).cast("long"), lit(2001L)) - 1000).as("w"))
      TextAnalysis.linearClassifierScore(Tables.documents(s, d),
        "doc_id", "text", wts, buckets = 1024)
    },

    // Classifier TRAINING (t11's other half): deterministic batch
    // perceptron over the same hashed-BoW features — the update is a
    // pure integer sum over the misclassified set, so all 3 unrolled
    // iterations replay exactly in the oracle (w1 from the all-
    // misclassified bootstrap, then two score→misclassify→delta
    // rounds). Labels derive from n_chars >= 300 (median-balanced on
    // this corpus); output is the full 1024-bucket weight table.
    Q("t12_classifier_train",
      s"""WITH base AS (
         |  SELECT doc_id, CASE WHEN n_chars >= 300 THEN 1 ELSE -1 END AS y,
         |         unnest(string_split(trim(text), ' ')) AS tok
         |  FROM documents),
         |dc AS (SELECT doc_id, y,
         |         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 1024 AS f,
         |         count(*) AS c
         |       FROM base GROUP BY 1, 2, 3),
         |$TrainCte
         |SELECT r.f AS feature, CAST(COALESCE(w3.w, 0) AS BIGINT) AS w
         |FROM (SELECT unnest(range(0, 1024)) AS f) r
         |LEFT JOIN w3 USING (f)""".stripMargin) { (s, d) =>
      TextAnalysis.perceptronTrain(Tables.documents(s, d), "doc_id",
        "text", when(col("n_chars") >= 300, 1L).otherwise(-1L),
        iters = 3, buckets = 1024)
    },

    // Train → serve, one gate: the t12 trainer's weight table fed
    // straight into t11's inference plan — the full classifier-filter
    // loop (FineWeb-Edu's pipeline shape) with every stage of both
    // halves replayed by the oracle.
    Q("pipe20_train_then_score",
      s"""WITH base AS (
         |  SELECT doc_id, CASE WHEN n_chars >= 300 THEN 1 ELSE -1 END AS y,
         |         unnest(string_split(trim(text), ' ')) AS tok
         |  FROM documents),
         |dc AS (SELECT doc_id, y,
         |         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 1024 AS f,
         |         count(*) AS c
         |       FROM base GROUP BY 1, 2, 3),
         |$TrainCte
         |SELECT d.doc_id, COALESCE(sc.score, 0) AS score,
         |       COALESCE(sc.score, 0) > 0 AS positive
         |FROM (SELECT DISTINCT doc_id FROM documents) d
         |LEFT JOIN (SELECT dc.doc_id, CAST(SUM(dc.c * w3.w) AS BIGINT) AS score
         |           FROM dc JOIN w3 USING (f) GROUP BY dc.doc_id) sc
         |USING (doc_id)""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val wts = TextAnalysis.perceptronTrain(docs, "doc_id", "text",
        when(col("n_chars") >= 300, 1L).otherwise(-1L),
        iters = 3, buckets = 1024)
      TextAnalysis.linearClassifierScore(docs, "doc_id", "text", wts,
        buckets = 1024)
    },

    // Brute-force cosine top-k for a small query set (exact baseline).
    Q("e1_ann_brute_topk",
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.qid, e.vec_id AS nid,
        |         list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
        |                                CAST(e.embedding AS DOUBLE[])) AS sim
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid)
        |SELECT qid AS query_id, nid AS neighbor_id, rank, round(sim, 4) AS sim
        |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY qid
        |        ORDER BY sim DESC, nid) AS INT) AS rank FROM scored)
        |WHERE rank <= 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", 5)
    },

    // Same brute-force top-k through the native codegen'd cosine
    // Expression — bit-identical accumulation, so it shares e1's
    // oracle shape.
    Q("e5_ann_brute_native",
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.qid, e.vec_id AS nid,
        |         list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
        |                                CAST(e.embedding AS DOUBLE[])) AS sim
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid)
        |SELECT qid AS query_id, nid AS neighbor_id, rank, round(sim, 4) AS sim
        |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY qid
        |        ORDER BY sim DESC, nid) AS INT) AS rank FROM scored)
        |WHERE rank <= 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", 5,
        cosineFn = (a, b) => Similarity.cosineNative(s, a, b))
    },

    // Symmetric int8 scalar quantization of the embedding store (4×
    // compression): per-dimension max-abs aggregate + codegen'd
    // quantize/dequantize pass. floor(+0.5) half-up keeps the math
    // bit-identical across engines, so codes AND worst-case
    // reconstruction error are both under the hash gate.
    Q("e6_scalar_quant",
      """WITH ex AS (
        |  SELECT vec_id, unnest(embedding) AS e,
        |         generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |dims AS (SELECT i, max(abs(e)) AS m FROM ex GROUP BY i),
        |qd AS (
        |  SELECT ex.vec_id, ex.i, d.m, ex.e,
        |    CASE WHEN d.m = 0 THEN 0.0
        |         ELSE floor(CAST(ex.e AS DOUBLE) * 127.0 / d.m + 0.5)
        |         END AS qv
        |  FROM ex JOIN dims d USING (i))
        |SELECT vec_id,
        |  string_agg(CAST(CAST(qv AS INT) AS VARCHAR), ',' ORDER BY i) AS q,
        |  max(abs(qv * m / 127.0 - CAST(e AS DOUBLE))) AS max_err
        |FROM qd GROUP BY vec_id""".stripMargin) { (s, d) =>
      Similarity.scalarQuantize(Tables.embeddings(s, d), "vec_id", "embedding")
        .select(col("vec_id"),
          array_join(transform(col("q"), _.cast("string")), ",").as("q"),
          col("max_err"))
    },

    // LSH-bucketed ANN — the scale path (bucket equi-join, corpus
    // streams once). Bucket membership is hash-family-dependent →
    // rows-only; recall is spec-tested against e1.
    Q.rowsOnly("e2_ann_lsh_topk") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", 5, planes = 6)
    },

    // IVF-bucketed ANN over label clusters (rows-only: ranking depends
    // on probed-cluster membership; recall spec-tested against e1).
    Q.rowsOnly("e4_ann_ivf_topk") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", "label", 5, nprobe = 3)
    },

    // Product-quantization ANN (FAISS-style IVF-less PQ): train m×k
    // codebooks (deterministic Lloyd, all subspaces in one loop),
    // encode the corpus as m small ints per vector, and answer top-k
    // via asymmetric-distance lookup sums over the codes — the corpus
    // side never touches a raw vector. Codebook membership is
    // training-dependent → rows-only; determinism, code bounds and
    // recall vs exact L2 are spec-gated.
    Q.rowsOnly("e9_ann_pq") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      // Deployment shape (Similarity.pqTrain docstring): codebooks
      // train on a deterministic ~25% hash sample — Lloyd iterations
      // scan only the sample — then the FULL corpus encodes and
      // searches against them.
      val codebook = Similarity.pqTrainLocal(
        graft.llm.Corpus.hashSample(emb, "vec_id", 25, "pqtrain"),
        "vec_id", "embedding", m = 8, k = 16, iters = 3)
      val codes = Similarity.pqEncode(emb, "vec_id", "embedding", codebook)
      Similarity.pqTopKRerank(codes, codebook, emb,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, overscan = 4)
    },

    // e9's portable twin (the d13/e8 discipline): the ENTIRE
    // production PQ path — subvector split, seed codebook,
    // nearest-codeword assignment, code assembly, ADC lookup-sum
    // shortlisting, and the exact-L2 shortlist re-rank
    // (pqTopKRerank, overscan 4) — under the DuckDB oracle. Input
    // vectors are integer-quantized (floor(x·1000 + 0.5) after a
    // double cast) and the codebook is the seed set (iters = 1), so
    // every distance — ADC and re-rank alike — is EXACT integer
    // arithmetic that cannot flip under a different summation order;
    // only the Lloyd update itself stays outside the oracle (its
    // integer-mean determinism is spec-gated with kmeansAssign).
    // Assignment ties break to the smallest code in both engines.
    Q("e10_ann_pq_portable",
      """WITH e AS (SELECT vec_id,
        |             list_transform(CAST(embedding AS DOUBLE[]),
        |                            x -> floor(x * 1000 + 0.5)) AS v
        |           FROM embeddings),
        |seeds AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id)
        |            AS INT) - 1 AS code
        |          FROM e ORDER BY vec_id LIMIT 16),
        |grid AS (SELECT unnest(range(0, 8)) AS j),
        |cb AS (SELECT CAST(grid.j AS INT) AS subspace, s.code,
        |         e.v[grid.j*8+1 : grid.j*8+8] AS c
        |       FROM seeds s JOIN e ON e.vec_id = s.vec_id CROSS JOIN grid),
        |sv AS (SELECT e.vec_id, CAST(grid.j AS INT) AS subspace,
        |         e.v[grid.j*8+1 : grid.j*8+8] AS sv
        |       FROM e CROSS JOIN grid),
        |dist AS (SELECT sv.vec_id, sv.subspace, cb.code,
        |           list_sum(list_transform(range(0, 8),
        |             i -> (sv.sv[i+1] - cb.c[i+1]) * (sv.sv[i+1] - cb.c[i+1])))
        |             AS d
        |         FROM sv JOIN cb ON sv.subspace = cb.subspace),
        |assign AS (SELECT vec_id, subspace, code FROM (
        |             SELECT *, row_number() OVER (
        |               PARTITION BY vec_id, subspace ORDER BY d, code) AS rn
        |             FROM dist) WHERE rn = 1),
        |lut AS (SELECT d.vec_id AS query_id, d.subspace, d.code,
        |          CAST(d.d AS BIGINT) * 1000000 AS dq
        |        FROM dist d WHERE d.vec_id < 10),
        |scored AS (SELECT l.query_id, a.vec_id AS neighbor_id,
        |             sum(l.dq) AS s
        |           FROM assign a
        |           JOIN lut l ON a.subspace = l.subspace AND a.code = l.code
        |           WHERE l.query_id <> a.vec_id
        |           GROUP BY l.query_id, a.vec_id),
        |short AS (SELECT query_id, neighbor_id FROM (
        |            SELECT *, row_number() OVER (PARTITION BY query_id
        |              ORDER BY s, neighbor_id) AS rn
        |            FROM scored) WHERE rn <= 20),
        |rr AS (SELECT sh.query_id, sh.neighbor_id,
        |         list_sum(list_transform(range(0, 64),
        |           i -> (eq.v[i+1] - en.v[i+1]) * (eq.v[i+1] - en.v[i+1])))
        |           AS dist
        |       FROM short sh
        |       JOIN e eq ON eq.vec_id = sh.query_id
        |       JOIN e en ON en.vec_id = sh.neighbor_id)
        |SELECT query_id, neighbor_id, rank, dist
        |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |        ORDER BY dist, neighbor_id) AS INT) AS rank
        |      FROM rr)
        |WHERE rank <= 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => floor(x.cast("double") * 1000 + 0.5)).as("qv"))
      val cb = Similarity.pqTrain(emb, "vec_id", "qv",
        m = 8, k = 16, iters = 1)
      val codes = Similarity.pqEncode(emb, "vec_id", "qv", cb)
      Similarity.pqTopKRerank(codes, cb, emb,
        emb.filter(col("vec_id") < 10), "vec_id", "qv",
        k = 5, overscan = 4)
    },

    // e2's portable twin (the d13 bucket family): sign-LSH top-k with
    // md5-parity hyperplanes over integer-quantized components, so
    // candidate generation AND ranking replay exactly in SQL — ranks
    // are deterministic because the sim doubles are bit-identical
    // (d6-proven) and ties break on neighbor id. Corpus bounded like
    // d6/d13 to keep the oracle's bucket self-join cheap.
    Q("e8_ann_lsh_portable",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 300),
        |w AS (SELECT vec_id,
        |        list_transform(v, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS wv
        |      FROM e),
        |grid AS (SELECT t.t, p.p
        |         FROM (SELECT unnest(range(0, 6)) AS t) t
        |         CROSS JOIN (SELECT unnest(range(0, 4)) AS p) p),
        |signs AS (SELECT t, p,
        |            list_transform(range(0, 64), i -> CASE
        |              WHEN CAST(('0x' || substr(md5(
        |                     CAST(t AS VARCHAR) || ',' || CAST(p AS VARCHAR)
        |                       || ',' || CAST(i AS VARCHAR)), 1, 1)) AS BIGINT)
        |                   % 2 = 1
        |              THEN 1 ELSE -1 END) AS s
        |          FROM grid),
        |dots AS (SELECT w.vec_id, g.t, g.p,
        |           list_sum(list_transform(range(0, 64),
        |             i -> wv[i + 1] * g.s[i + 1])) AS dot
        |         FROM w CROSS JOIN signs g),
        |bk AS (SELECT vec_id, t,
        |         sum(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS bkt
        |       FROM dots GROUP BY vec_id, t),
        |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |         FROM bk c JOIN (SELECT * FROM bk WHERE vec_id < 10) q
        |           ON c.t = q.t AND c.bkt = q.bkt AND c.vec_id <> q.vec_id),
        |scored AS (SELECT cand.query_id, cand.neighbor_id,
        |             list_cosine_similarity(eq.v, ec.v) AS sim
        |           FROM cand
        |           JOIN e eq ON eq.vec_id = cand.query_id
        |           JOIN e ec ON ec.vec_id = cand.neighbor_id)
        |SELECT query_id, neighbor_id, rank, round(sim, 4) AS sim
        |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id) AS INT) AS rank
        |      FROM scored)
        |WHERE rank <= 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).filter(col("vec_id") < 300)
      Similarity.lshTopKPortable(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", 5)
    },

    // IVF over LEARNED clusters: deterministic Lloyd k-means replaces
    // the data's label column (the production shape when no natural
    // partitioning exists). Rows-only like e4 — ranking depends on
    // probed-cluster membership; assignment determinism and recall are
    // spec-tested (DedupSpec).
    Q.rowsOnly("e7_ann_ivf_kmeans") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      // Deployment shape: Lloyd trains on a deterministic ~25% hash
      // sample; the full corpus is then assigned in one broadcast
      // map-side pass and searched.
      val cents = Similarity.kmeansCentroidsLocal(
        graft.llm.Corpus.hashSample(emb, "vec_id", 25, "ivftrain"),
        "vec_id", "embedding", k = 8, iters = 3)
      val assign = Similarity.assignToCentroids(emb, "vec_id", "embedding",
        cents)
      val withC = emb.join(assign, Seq("vec_id"))
      Similarity.ivfTopK(withC, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", "cluster", 5, nprobe = 3)
    },

    // e4/e7's portable twin (the e8/e10 discipline): the ENTIRE
    // production IVF path — deterministic seed selection
    // (kmeansAssign's k-smallest-ids seeding at iters = 1), the
    // broadcast-centroid min_by assignment with its lpad tie-break,
    // ivfTopK's per-dimension centroid MEANS, nprobe probe selection,
    // and the exact cosine ranking — under the DuckDB hash oracle.
    // Inputs are integer-quantized (floor(x·1000 + 0.5), cast back to
    // float — exact: |x·1000| ≪ 2²⁴), so every sum in every cosine is
    // exact integer arithmetic and the centroid means are
    // exact-integer sums divided once by a count — bit-identical in
    // both engines regardless of accumulation order. The oracle
    // replays Spark's cosine FORMULA exactly (dot / (√Σa² · √Σb²),
    // sequential index-order folds), not an engine builtin, so the
    // doubles agree to the last bit. Only the Lloyd UPDATE loop stays
    // outside the oracle (iters = 1 never runs it); its integer-mean
    // determinism is spec-gated with kmeansAssign (DedupSpec).
    Q("e11_ann_ivf_portable",
      """WITH e AS (SELECT vec_id,
        |             list_transform(CAST(embedding AS DOUBLE[]),
        |                            x -> floor(x * 1000 + 0.5)) AS v
        |           FROM embeddings),
        |sc AS (SELECT CAST(vec_id AS VARCHAR) AS cluster, v AS centroid
        |       FROM e ORDER BY vec_id LIMIT 8),
        |asg AS (SELECT vec_id, cluster FROM (
        |          SELECT e.vec_id, sc.cluster, row_number() OVER (
        |            PARTITION BY e.vec_id ORDER BY
        |              (list_sum(list_transform(range(0, 64),
        |                 i -> e.v[i+1] * sc.centroid[i+1]))
        |               / (sqrt(list_sum(list_transform(e.v, x -> x * x))) *
        |                  sqrt(list_sum(list_transform(sc.centroid,
        |                    x -> x * x))))) DESC,
        |              lpad(cluster, 24, '0')) AS rn
        |          FROM e CROSS JOIN sc) WHERE rn = 1),
        |ex AS (SELECT a.cluster, unnest(e.v) AS x,
        |         generate_subscripts(e.v, 1) AS i
        |       FROM e JOIN asg a ON e.vec_id = a.vec_id),
        |cm AS (SELECT cluster, i, avg(x) AS m FROM ex GROUP BY cluster, i),
        |cent AS (SELECT cluster, list(m ORDER BY i) AS centroid
        |         FROM cm GROUP BY cluster),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        |pr AS (SELECT query_id, qv, cluster FROM (
        |         SELECT q.query_id, q.qv, c.cluster, row_number() OVER (
        |           PARTITION BY q.query_id ORDER BY
        |             (list_sum(list_transform(range(0, 64),
        |                i -> q.qv[i+1] * c.centroid[i+1]))
        |              / (sqrt(list_sum(list_transform(q.qv, x -> x * x))) *
        |                 sqrt(list_sum(list_transform(c.centroid,
        |                   x -> x * x))))) DESC,
        |             c.cluster) AS crank
        |         FROM q CROSS JOIN cent c) WHERE crank <= 3),
        |scored AS (SELECT pr.query_id, e.vec_id AS neighbor_id,
        |             list_sum(list_transform(range(0, 64),
        |               i -> pr.qv[i+1] * e.v[i+1]))
        |             / (sqrt(list_sum(list_transform(pr.qv, x -> x * x))) *
        |                sqrt(list_sum(list_transform(e.v, x -> x * x)))) AS sim
        |           FROM e JOIN asg a ON e.vec_id = a.vec_id
        |           JOIN pr ON a.cluster = pr.cluster
        |           WHERE pr.query_id <> e.vec_id)
        |SELECT query_id, neighbor_id, rank, round(sim, 4) AS sim
        |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id) AS INT) AS rank
        |      FROM scored)
        |WHERE rank <= 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => floor(x.cast("double") * 1000 + 0.5).cast("float")).as("qv"))
      val assign = Similarity.kmeansAssign(emb, "vec_id", "qv",
        k = 8, iters = 1)
      val withC = emb.join(assign, Seq("vec_id"))
      Similarity.ivfTopK(withC, emb.filter(col("vec_id") < 10),
        "vec_id", "qv", "cluster", 5, nprobe = 3)
    },

    // IVF-PQ (FAISS IVFPQ, the canonical billion-scale ANN layout):
    // coarse k-means clusters the corpus, PQ quantizes the RESIDUAL
    // vector − coarse-centroid (much lower energy than the raw vector,
    // so the same code budget quantizes finer), queries probe nprobe
    // lists and scan codes only via per-probe ADC tables, and the
    // shortlist re-ranks exactly. Rows-only like e7/e9 — membership is
    // training-dependent; determinism and recall are spec-gated
    // (TwinConsistencySpec "e12/e13").
    Q.rowsOnly("e12_ann_ivfpq") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      // Deployment shape: coarse centroids AND residual codebooks train
      // on a deterministic ~25% hash sample; the full corpus is then
      // assigned, encoded, and searched against them.
      val sample = graft.llm.Corpus.hashSample(emb, "vec_id", 25, "ivfpqtrain")
      val cents = Similarity.kmeansCentroidsLocal(sample,
        "vec_id", "embedding", k = 8, iters = 3)
      // The assignment table is materialized once (what a deployment
      // does — it IS the inverted-list index): it feeds both the
      // codebook-training branch and the encode branch, and without
      // the checkpoint each branch re-runs the broadcast-centroid
      // assignment over the full corpus.
      val assign = Similarity.assignToCentroids(emb, "vec_id", "embedding",
        cents).truncateLineage()
      val withC = emb.join(assign, Seq("vec_id"))
      val cb = Similarity.ivfpqTrainLocal(
        graft.llm.Corpus.hashSample(withC, "vec_id", 25, "ivfpqtrain"),
        "vec_id", "embedding", "cluster", cents, m = 8, k = 16, iters = 3)
      val codes = Similarity.ivfpqEncode(withC, "vec_id", "embedding",
        "cluster", cents, cb)
      Similarity.ivfpqTopKRerank(codes, cents, cb, emb,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nprobe = 3, overscan = 4)
    },

    // e12's portable twin (the e10/e11 discipline): the ENTIRE
    // production IVF-PQ path — coarse seed selection and the
    // broadcast-centroid min_by assignment with its lpad tie-break
    // (e11's coarse half), residual computation against the assigned
    // centroid, seed residual codebooks (iters = 1), nearest-codeword
    // assignment, per-probe query residuals and their ADC lookup
    // tables, probed-list-only code scoring, and the exact-L2
    // shortlist re-rank — under the DuckDB hash oracle. Inputs are
    // integer-quantized (floor(x·1000 + 0.5)), and with iters = 1 the
    // coarse centroids ARE seed vectors, so residuals are exact
    // integer differences and every distance — probe cosine (replayed
    // as Spark's exact formula, the e11 proof), ADC sums, re-rank L2 —
    // is exact integer arithmetic that cannot flip under summation
    // order. Only the Lloyd update stays outside (spec-gated).
    Q("e13_ann_ivfpq_portable", IvfPqPortableOracleSql) { (s, d) =>
      val emb = quantizedEmb(s, d)
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "qv",
        k = 8, iters = 1)
      val assign = Similarity.assignToCentroids(emb, "vec_id", "qv", cents)
      val withC = emb.join(assign, Seq("vec_id"))
      val cb = Similarity.ivfpqTrain(withC, "vec_id", "qv", "cluster",
        cents, m = 8, k = 16, iters = 1)
      val codes = Similarity.ivfpqEncode(withC, "vec_id", "qv", "cluster",
        cents, cb)
      Similarity.ivfpqTopKRerank(codes, cents, cb, emb,
        emb.filter(col("vec_id") < 10), "vec_id", "qv",
        k = 5, nprobe = 3, overscan = 4)
    },

    // e13 THROUGH THE PERSISTED INDEX: identical model and config (the
    // trainers are deterministic and parquet round-trips doubles
    // bit-exactly), but trained ONCE into an [[graft.llm.IndexStore]]
    // artifact — params sidecar, structural drift guard — and searched
    // FROM the store: centroids, codebook and inverted lists all read
    // back from disk. Shares e13's oracle verbatim because the store
    // round-trip must be invisible to results; that equality IS the
    // artifact-fidelity gate.
    Q("e14_ann_ivfpq_store", IvfPqPortableOracleSql) { (s, d) =>
      val emb = quantizedEmb(s, d)
      val dir = Fixtures.stampedDir(d, "embeddings", "ivfpq_store", 1)
        .resolve("ix").toString
      val params = IndexStore.Params(dim = 64, clusters = 8, m = 8, k = 16)
      IndexStore.build(emb, "vec_id", "qv", dir, params, iters = 1)
      IndexStore.searchTopKRerank(s, dir, params, emb,
        emb.filter(col("vec_id") < 10), "vec_id", "qv",
        k = 5, nprobe = 3, overscan = 4)
    },


    // Multimodal: REAL image decode — one genuine PNG per document
    // (variable W×H, pixel channels from an arithmetic ground-truth
    // formula), decoded on javax.imageio inside the scan projection
    // and channel-mean pooled to a fixed 12-dim feature vector. The
    // Spark side sees ONLY the encoded bytes and must decode them for
    // real; the oracle replays the pooling arithmetic from the pixel
    // formula — a wrong decode (wrong pixel, wrong channel order,
    // wrong cell split) hash-diverges immediately.
    // REAL PDF text extraction (plans/PdfExpr): genuine multi-page
    // PDFs synthesized in-plan (pdf_synth — header/page-tree/Flate
    // content streams/xref, opens in any reader), then decoded for
    // real: inflate + content-stream operator parse (Tj/TJ/escapes).
    // The oracle replays the page split from the documents text —
    // a wrong inflate, wrong escape, or wrong operator handling
    // hash-diverges immediately (the m1/m6 media-decode discipline
    // applied to the documents modality).
    Q("m15_pdf_text",
      """SELECT doc_id,
        |  array_to_string(list_transform(
        |    range(0, CAST(ceil(length(text)/150.0) AS BIGINT)),
        |    i -> substr(text, CAST(i*150+1 AS INT), 150)), chr(10))
        |    AS text,
        |  CAST(ceil(length(text)/150.0) AS INT) AS n_pages,
        |  '1.4' AS version
        |FROM documents""".stripMargin) { (s, d) =>
      graft.plans.PdfSynthExpr.register(s)
      graft.plans.PdfTextExpr.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"),
          call_function(graft.plans.PdfSynthExpr.Name, col("text"),
            lit(150)).as("pdf"))
        .withColumn("__p", explode(array(
          call_function(graft.plans.PdfTextExpr.Name, col("pdf")))))
        .select(col("doc_id"), col("__p.text").as("text"),
          col("__p.n_pages").as("n_pages"),
          col("__p.version").as("version"))
    },

    // PDF CID extraction (m15's modern-generator sibling): the same
    // round-trip gate through a genuine Type0/Identity-H PDF —
    // 2-byte hex-string codes, a Flate /ToUnicode CMap carrying both
    // bfchar AND increment-form bfrange blocks, a /Tf font switch the
    // extractor must honor — with a CJK suffix so the mapping is
    // exercised beyond Latin-1 (BMP-only: DuckDB's substr counts code
    // points, Scala's grouped counts UTF-16 units; they agree exactly
    // on BMP text). The code assignment is rank-based, NOT identity,
    // so a hash match proves the CMap was genuinely read.
    Q("m16_pdf_cid",
      """WITH t AS (SELECT doc_id, text || ' 日本語テキスト中文資料'
        |             AS ft FROM documents)
        |SELECT doc_id,
        |  array_to_string(list_transform(
        |    range(0, CAST(ceil(length(ft)/150.0) AS BIGINT)),
        |    i -> substr(ft, CAST(i*150+1 AS INT), 150)), chr(10))
        |    AS text,
        |  CAST(ceil(length(ft)/150.0) AS INT) AS n_pages,
        |  '1.4' AS version
        |FROM t""".stripMargin) { (s, d) =>
      graft.plans.PdfSynthCidExpr.register(s)
      graft.plans.PdfTextExpr.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"),
          call_function(graft.plans.PdfSynthCidExpr.Name,
            concat(col("text"), lit(" 日本語テキスト中文資料")),
            lit(150)).as("pdf"))
        .withColumn("__p", explode(array(
          call_function(graft.plans.PdfTextExpr.Name, col("pdf")))))
        .select(col("doc_id"), col("__p.text").as("text"),
          col("__p.n_pages").as("n_pages"),
          col("__p.version").as("version"))
    },

    Q("m1_media_features",
      s"""WITH m AS (SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h
        |           FROM documents WHERE doc_id < $PngMediaDocs),
        |gx AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM m),
        |gy AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM gx),
        |px AS (SELECT doc_id, w, h, x, y, unnest([0, 1, 2]) AS c FROM gy)
        |SELECT doc_id AS media_id,
        |       CAST((((y * 2) // h) * 2 + (x * 2) // w) * 3 + c AS INT) AS pos,
        |       round(sum((doc_id * 73 + (y * w + x) * 97 + c * 31) % 256)
        |             / count(*) / 255.0, 4) AS feature
        |FROM px GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Multimodal.extractFeaturesImage(pngMedia(s, d), grid = 2)
        .select(col("media_id"),
          posexplode(col("features")).as(Seq("pos", "feature")))
        .withColumn("feature", round(col("feature"), 4))
    },

    // Multimodal: REAL audio decode — one genuine WAV (16-bit PCM,
    // variable length, samples from an arithmetic ground-truth
    // formula) per document, decoded on javax.sound.sampled inside
    // the scan projection and mean-pooled over 8 time buckets. The
    // Spark side sees ONLY the encoded RIFF bytes; the oracle replays
    // the pooling from the sample formula — a wrong sample, byte
    // order, or bucket split hash-diverges. /32768 is a power of two,
    // so the scaling is IEEE-exact in both engines.
    Q("m4_audio_features",
      s"""WITH m AS (SELECT doc_id, 400 + (doc_id % 7) * 50 AS n
        |           FROM documents WHERE doc_id < $PngMediaDocs),
        |t AS (SELECT doc_id, n, unnest(range(0, n)) AS t FROM m)
        |SELECT doc_id AS media_id, CAST(t * 8 // n AS INT) AS pos,
        |       round(sum((doc_id * 131 + t * 17) % 4001 - 2000)
        |             / count(*) / 32768.0, 6) AS feature
        |FROM t GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Multimodal.extractFeaturesAudio(wavMedia(s, d), dim = 8)
        .select(col("media_id"),
          posexplode(col("features")).as(Seq("pos", "feature")))
        .withColumn("feature", round(col("feature"), 6))
    },

    // Multimodal: REAL audio QUALITY stats — the curation filter's
    // inputs (silence ⇔ sum_sq/n ≈ 0, clipping ⇔ peak at full scale,
    // stuck-DC ⇔ ~0 zero crossings) computed as EXACT integers over
    // the decoded channel-0 samples, so the oracle replays the
    // fixture's sample formula bit-for-bit: a wrong byte order,
    // channel stride, or crossing rule diverges. The m4 pooling gate's
    // sibling over the same real WAV payloads.
    Q("m13_audio_quality",
      s"""WITH m AS (SELECT doc_id, 400 + (doc_id % 7) * 50 AS n
        |           FROM documents WHERE doc_id < $PngMediaDocs),
        |t AS (SELECT doc_id, n, unnest(range(0, n)) AS t FROM m),
        |s AS (SELECT doc_id, n, t,
        |             (doc_id * 131 + t * 17) % 4001 - 2000 AS v FROM t),
        |s2 AS (SELECT doc_id, n, t, v,
        |              lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS pv
        |       FROM s)
        |SELECT doc_id AS media_id,
        |       CAST(max(n) AS BIGINT) AS n_samples,
        |       CAST(max(abs(v)) AS BIGINT) AS peak,
        |       CAST(sum(v * v) AS BIGINT) AS sum_sq,
        |       CAST(count(*) FILTER (WHERE pv IS NOT NULL AND pv * v < 0)
        |            AS BIGINT) AS zero_crossings
        |FROM s2 GROUP BY 1""".stripMargin) { (s, d) =>
      Multimodal.audioStats(wavMedia(s, d))
        .select(col("media_id"),
          col("stats.n_samples").as("n_samples"),
          col("stats.peak").as("peak"),
          col("stats.sum_sq").as("sum_sq"),
          col("stats.zero_crossings").as("zero_crossings"))
    },

    // Multimodal: REAL video container metadata — genuine ISO-BMFF
    // payloads with all-null meta structs; the dims and the duration
    // the frame sampler explodes over can ONLY come from parsing the
    // moov/mvhd/tkhd boxes (video_meta). The oracle replays the
    // construction formula; a wrong box walk, fixed-point shift, or
    // timescale division hash-diverges. Pixel decode (the one
    // modality half the JDK has no codec for) stays behind the
    // contract-tested stub seam.
    Q("m5_video_meta",
      s"""WITH m AS (SELECT doc_id, 320 + (doc_id % 5) * 16 AS w,
        |                  240 + (doc_id % 3) * 16 AS h,
        |                  1000 + (doc_id % 11) * 500 AS dur
        |           FROM documents WHERE doc_id < $PngMediaDocs)
        |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
        |       CAST(h AS INT) AS height,
        |       unnest(generate_series(0, dur - 1, 500)) AS frame_ms
        |FROM m""".stripMargin) { (s, d) =>
      val withMeta = Multimodal.refreshVideoMeta(mp4Media(s, d))
      Multimodal.sampleFrames(withMeta, everyMs = 500L)
        .select(col("media_id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("frame_ms"))
    },

    // Multimodal: REAL video PIXEL decode — genuine MJPEG-AVI payloads
    // (RIFF container, real JPEG frames) walked chunk-by-chunk and
    // decoded frame-by-frame on javax.imageio inside the scan
    // projection, each frame pooled like an image. The frames are
    // constant gray from an arithmetic formula — the JPEG-invariant
    // subset (bit-exact round-trip at quality 1.0, MultimodalSpec pins
    // all 256 values) — so the oracle replays the formula exactly: a
    // wrong chunk walk, frame boundary, or decode hash-diverges. With
    // this every modality's decode is real; only codecs the JDK lacks
    // (H.264/VP9/…) stay behind the contract-tested stub seam.
    Q("m6_video_frames",
      s"""WITH m AS (SELECT doc_id, 2 + doc_id % 4 AS nf
        |           FROM documents WHERE doc_id < $PngMediaDocs),
        |f AS (SELECT doc_id, unnest(range(0, nf)) AS fi FROM m),
        |p AS (SELECT doc_id, fi, unnest(range(0, 12)) AS pos FROM f)
        |SELECT doc_id AS media_id, CAST(fi AS INT) AS frame_idx,
        |       CAST(pos AS INT) AS pos,
        |       ((doc_id * 37 + fi * 59) % 256) / 255.0 AS feature
        |FROM p""".stripMargin) { (s, d) =>
      Multimodal.extractFrameFeaturesVideo(aviMedia(s, d), grid = 2)
        .select(col("media_id"), col("frame_idx"),
          posexplode(col("features")).as(Seq("pos", "feature")))
    },

    // Multimodal: REAL video pixel decode in the SECOND major
    // container — genuine photo-JPEG MOV/MP4 payloads (full ISO-BMFF
    // sample table) whose JPEG samples sit in mdat at stco/stsz
    // offsets the decoder must expand, each decoded on javax.imageio
    // inside the scan projection and pooled like an image. Constant-
    // gray frames (the JPEG-invariant subset, same discipline as m6)
    // keep the oracle's pixel formula exact: a wrong box walk, sample
    // boundary, or decode hash-diverges. m6 gates the AVI container;
    // THIS gates the ISO-BMFF one — together they cover both families
    // a crawl's MJPEG actually ships in.
    Q("m10_mov_frames",
      s"""WITH m AS (SELECT doc_id, 2 + doc_id % 3 AS nf
        |           FROM documents WHERE doc_id < $PngMediaDocs),
        |f AS (SELECT doc_id, unnest(range(0, nf)) AS fi FROM m),
        |p AS (SELECT doc_id, fi, unnest(range(0, 12)) AS pos FROM f)
        |SELECT doc_id AS media_id, CAST(fi AS INT) AS frame_idx,
        |       CAST(pos AS INT) AS pos,
        |       ((doc_id * 41 + fi * 67) % 256) / 255.0 AS feature
        |FROM p""".stripMargin) { (s, d) =>
      Multimodal.extractFrameFeaturesVideo(movMedia(s, d), grid = 2)
        .select(col("media_id"), col("frame_idx"),
          posexplode(col("features")).as(Seq("pos", "feature")))
    },

    // Multimodal: CONTENT-level video dedup — the composition the real
    // frame decode enables. Fixture videos sharing doc_id mod 50 have
    // pixel-identical frames but DIFFERENT container bytes (timing
    // metadata varies per doc), so hashing payloads finds zero groups;
    // the query decodes every frame, fingerprints the ordered pooled-
    // feature sequence, and groups on that. The oracle replays the
    // group structure from the fixture formula — a wrong chunk walk,
    // frame order, or decode collapses or splinters groups and
    // hash-diverges. (The scale path for NEAR-dup videos is the same
    // per-frame features into the embedding-LSH family, d7/d13.)
    Q("pipe28_video_dedup",
      s"""WITH g AS (SELECT doc_id % 50 AS grp, doc_id
        |           FROM documents WHERE doc_id < $PngMediaDocs)
        |SELECT CAST(min(doc_id) AS BIGINT) AS canonical_id,
        |       CAST(count(*) AS BIGINT) AS group_size,
        |       array_to_string(list_sort(array_agg(doc_id)), ',') AS members
        |FROM g GROUP BY grp""".stripMargin) { (s, d) =>
      val frames = Multimodal.extractFrameFeaturesVideo(
        aviDupMedia(s, d), grid = 2)
      val fp = frames.groupBy("media_id")
        .agg(md5(to_json(array_sort(collect_list(
          struct(col("frame_idx"), col("features")))))).as("fp"))
      fp.groupBy("fp")
        .agg(min(col("media_id")).as("canonical_id"),
          count(lit(1)).as("group_size"),
          array_join(transform(array_sort(collect_list(col("media_id"))),
            _.cast("string")), ",").as("members"))
        .select("canonical_id", "group_size", "members")
    },

    // Multimodal: CONTAINER-INVARIANT video dedup — pipe28's group
    // structure with every dup group split ACROSS containers (even
    // members muxed as RIFF/AVI with per-doc timing, odd members as
    // photo-JPEG MOV): same pixels, maximally different bytes. The
    // decoded-content fingerprint must reunite them — a container walk
    // that leaks layout into the features (frame order, a missed
    // sample, an extra null) splinters the groups and hash-diverges.
    // The oracle replays the group structure from the fixture formula,
    // which mentions no container at all: THAT is the invariance.
    Q("pipe29_container_invariant_dedup",
      s"""WITH g AS (SELECT doc_id % 50 AS grp, doc_id
        |           FROM documents WHERE doc_id < $PngMediaDocs)
        |SELECT CAST(min(doc_id) AS BIGINT) AS canonical_id,
        |       CAST(count(*) AS BIGINT) AS group_size,
        |       array_to_string(list_sort(array_agg(doc_id)), ',') AS members
        |FROM g GROUP BY grp""".stripMargin) { (s, d) =>
      val frames = Multimodal.extractFrameFeaturesVideo(
        mixedDupMedia(s, d), grid = 2)
      val fp = frames.groupBy("media_id")
        .agg(md5(to_json(array_sort(collect_list(
          struct(col("frame_idx"), col("features")))))).as("fp"))
      fp.groupBy("fp")
        .agg(min(col("media_id")).as("canonical_id"),
          count(lit(1)).as("group_size"),
          array_join(transform(array_sort(collect_list(col("media_id"))),
            _.cast("string")), ",").as("members"))
        .select("canonical_id", "group_size", "members")
    },

    // Multimodal: frame sampling — one row per sampled timestamp, the
    // payload never replicated per frame.
    Q("m2_frame_sample",
      """SELECT doc_id AS media_id,
        |       unnest(generate_series(0, CAST(n_chars AS BIGINT) - 1, 100))
        |         AS frame_ms
        |FROM documents WHERE n_chars > 0""".stripMargin) { (s, d) =>
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("content"),
        struct(lit("video/mp4").as("mime"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          col("n_chars").cast("long").as("duration_ms")).as("meta"))
      Multimodal.sampleFrames(media, everyMs = 100L)
        .select(col("media_id"), col("frame_ms"))
    },

    // The multimodal pipeline END-TO-END: real PNG payloads →
    // javax.imageio decode → pooled feature vectors → centered →
    // embedding near-dup pairs — the "dedup an image corpus by
    // embedding similarity" production op, with every stage (decode,
    // pooling, centering, cosine verify) gated under one oracle.
    // Centering (−0.5 per feature) matters: raw pixel means of
    // pseudo-uniform pixels cluster at ~0.5, putting every cosine at
    // ~1.0 — centered, the pair set is selective. Bounded like d6 so
    // the oracle's exact self-join stays cheap; the scale path is the
    // same features into embeddingNearDupPairsLsh (d7's composition).
    Q("pipe23_media_neardup",
      s"""WITH m AS (SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h
        |           FROM documents WHERE doc_id < $PngMediaDocs),
        |gx AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM m),
        |gy AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM gx),
        |px AS (SELECT doc_id, w, h, x, y, unnest([0, 1, 2]) AS c FROM gy),
        |feat AS (
        |  SELECT doc_id AS media_id,
        |         CAST((((y * 2) // h) * 2 + (x * 2) // w) * 3 + c AS INT) AS pos,
        |         sum((doc_id * 73 + (y * w + x) * 97 + c * 31) % 256)
        |           / count(*) / 255.0 - 0.5 AS feature
        |  FROM px GROUP BY 1, 2),
        |v AS (SELECT media_id, list(feature ORDER BY pos) AS v
        |      FROM feat GROUP BY 1)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |       round(list_cosine_similarity(a.v, b.v), 4) AS sim
        |FROM v a JOIN v b ON a.media_id < b.media_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.5""".stripMargin) {
      (s, d) =>
      val feats = Multimodal.extractFeaturesImage(pngMedia(s, d), grid = 2)
        .withColumn("features",
          transform(col("features"), f => f - lit(0.5)))
      Dedup.embeddingNearDupPairsExact(
        feats.select(col("media_id"), col("features")),
        "media_id", "features", 0.5)
    },

    // Per-label embedding stats (vector-column handling).
    Q("e3_label_stats",
      """SELECT label, CAST(count(*) AS BIGINT) AS cnt,
        |       round(avg(CAST(embedding[1] AS DOUBLE)), 3) AS avg_first
        |FROM embeddings GROUP BY label""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .groupBy("label")
        .agg(count(lit(1)).as("cnt"),
             round(avg(element_at(col("embedding"), 1).cast("double")), 3).as("avg_first"))
    })

  private def sqlList(xs: Seq[String]): String = Q.sqlList(xs)

  /** The t13 oracle, generated per merge count: round k re-derives
    * pair counts from w(k-1), takes the (count desc, l, r) arg-max,
    * marks greedy-fold merge positions (odd parity within
    * consecutive-match runs — only l = r can produce adjacent
    * matches), and rebuilds every word's symbol list. CTEs are
    * MATERIALIZED: each round references its predecessor three times,
    * and inlined CTEs re-evaluate the whole chain exponentially
    * (measured: >120 s inlined vs 0.23 s materialized at sf0.001). */
  /** t16's synthesized page: deterministic HTML around each document's
    * text. The five conditional blocks exercise every stage rule —
    * letterless list rows, link density, entity decode, comment
    * adjacency, unclosed-at-EOF script. Must stay in lockstep with
    * [[t16HtmlSql]], its DuckDB spelling. */
  private[graft] def t16Html: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    concat(
      lit("<!DOCTYPE html><html><head><title>Doc "), id.cast("string"),
      lit(" overview page</title>"),
      lit("<style>body { color: #222; }</style>"),
      lit("<script>var n = 1 < 2 && 3 > 2;</script></head>"),
      lit("<body><nav><a href='/'>Home</a> <a href='/d'>Docs</a> " +
        "<a href='/c'>Contact</a></nav>"),
      lit("<h1>Document "), id.cast("string"), lit("</h1>"),
      lit("<p>"), col("text"), lit("</p>"),
      when(id % 3 === 0,
        "<ul><li>alpha beta gamma delta</li><li>7 8 9 10 11</li></ul>")
        .otherwise(""),
      when(id % 4 === 0,
        "<div>read the manual <a href='/m'>here</a> any time</div>")
        .otherwise(""),
      when(id % 5 === 0,
        "<p>Tom &amp; Jerry &lt;3 &quot;quotes&quot; &apos;here&apos; now</p>")
        .otherwise(""),
      when(id % 7 === 0,
        "<!-- hidden <p>ghost block</p> --><p>visible after the comment</p>")
        .otherwise(""),
      when(id % 11 === 0, "<script>unclosed tail swallows the rest")
        .otherwise("</body></html>"))
  }

  /** [[t16Html]] in DuckDB SQL (single-quoted literals, '' escapes). */
  private def t16HtmlSql: String =
    """'<!DOCTYPE html><html><head><title>Doc ' || doc_id ||
      |' overview page</title>' ||
      |'<style>body { color: #222; }</style>' ||
      |'<script>var n = 1 < 2 && 3 > 2;</script></head>' ||
      |'<body><nav><a href=''/''>Home</a> <a href=''/d''>Docs</a> ' ||
      |'<a href=''/c''>Contact</a></nav>' ||
      |'<h1>Document ' || doc_id || '</h1>' ||
      |'<p>' || text || '</p>' ||
      |CASE WHEN doc_id % 3 = 0
      |  THEN '<ul><li>alpha beta gamma delta</li><li>7 8 9 10 11</li></ul>'
      |  ELSE '' END ||
      |CASE WHEN doc_id % 4 = 0
      |  THEN '<div>read the manual <a href=''/m''>here</a> any time</div>'
      |  ELSE '' END ||
      |CASE WHEN doc_id % 5 = 0
      |  THEN '<p>Tom &amp; Jerry &lt;3 &quot;quotes&quot; &apos;here&apos; now</p>'
      |  ELSE '' END ||
      |CASE WHEN doc_id % 7 = 0
      |  THEN '<!-- hidden <p>ghost block</p> --><p>visible after the comment</p>'
      |  ELSE '' END ||
      |CASE WHEN doc_id % 11 = 0
      |  THEN '<script>unclosed tail swallows the rest'
      |  ELSE '</body></html>' END""".stripMargin

  /** The [[graft.plans.HtmlText]] stage chain as a DuckDB CTE body
    * over the t16 fixture — the regex patterns are rendered FROM the
    * shared constants (RE2 spelling via HtmlText.re2), the entity
    * chain from HtmlText.Entities, so the two sides cannot drift.
    * Per-line signals ride a struct_pack so each line's word list is
    * computed once. `carry` threads extra document columns (e.g.
    * ", lang") through every stage; the final CTE is
    * `xt(doc_id[, carry], text, n_lines_kept, n_lines_dropped)` —
    * t16 selects from it directly, pipe30 stacks the curation funnel
    * on top. */
  private[queries] def htmlExtractCtes(carry: String): String = {
    import graft.plans.HtmlText
    val ent = HtmlText.Entities.foldLeft("s") { case (acc, (e, c)) =>
      s"replace($acc, '$e', '${c.replace("'", "''")}')"
    }
    s"""h AS (SELECT doc_id$carry, $t16HtmlSql AS html FROM documents),
       |hc1 AS (SELECT doc_id$carry, regexp_replace(html,
       |  '${HtmlText.re2(HtmlText.CommentPat)}', '', 'gs') AS s FROM h),
       |hc2 AS (SELECT doc_id$carry, regexp_replace(s,
       |  '${HtmlText.re2(HtmlText.ScriptPat)}', '', 'gis') AS s FROM hc1),
       |hc3 AS (SELECT doc_id$carry, regexp_replace(s,
       |  '${HtmlText.re2(HtmlText.StylePat)}', '', 'gis') AS s FROM hc2),
       |hb1 AS (SELECT doc_id$carry, regexp_replace(s,
       |  '${HtmlText.re2(HtmlText.AnchorPat)}', chr(1), 'gi') AS s FROM hc3),
       |hb2 AS (SELECT doc_id$carry, regexp_replace(s,
       |  '${HtmlText.re2(HtmlText.BlockPat)}', chr(10), 'gi') AS s FROM hb1),
       |hb3 AS (SELECT doc_id$carry, regexp_replace(s,
       |  '${HtmlText.TagPat}', '', 'g') AS s FROM hb2),
       |he AS (SELECT doc_id$carry, $ent AS s FROM hb3),
       |hw AS (SELECT doc_id$carry,
       |  regexp_replace(s, '[ \\t\\r]+', ' ', 'g') AS s FROM he),
       |hl AS (SELECT doc_id$carry,
       |  list_filter(list_transform(string_split(s, chr(10)),
       |    x -> trim(x)), x -> x <> '') AS ls FROM hw),
       |hk AS (SELECT doc_id$carry, list_transform(ls, x -> struct_pack(
       |    txt := trim(regexp_replace(replace(x, chr(1), ''),
       |                               ' +', ' ', 'g')),
       |    nw := len(list_filter(string_split(replace(x, chr(1), ''),
       |      ' '), t -> t <> '')),
       |    na := len(list_filter(list_filter(string_split(
       |      replace(x, chr(1), ''), ' '), t -> t <> ''),
       |      t -> regexp_matches(t, '\\p{L}'))),
       |    nl := length(x) - length(replace(x, chr(1), ''))))
       |  AS st FROM hl),
       |hf AS (SELECT doc_id$carry, st, list_filter(st, r ->
       |    r.nw >= 3 AND 2*r.nl <= r.nw AND 2*r.na >= r.nw) AS kept
       |  FROM hk),
       |xt AS (SELECT doc_id$carry,
       |  array_to_string(list_transform(kept, r -> r.txt), chr(10)) AS text,
       |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
       |  CAST(len(st) - len(kept) AS BIGINT) AS n_lines_dropped
       |FROM hf)""".stripMargin
  }

  /** t17's host classes — one per public-suffix rule class: plain
    * gTLD (case-mangled), ccSLD multi-label, deeper ccSLD, ccTLD,
    * private registry, unknown single-label, deep subdomain chain. */
  private val T17Hosts: Seq[String] = Seq(
    "Example.COM", "news.example.co.uk", "sub.a.example.com.au",
    "www.test.de", "blog.github.io", "weird", "x.y.z.example.org")

  /** t17/pipe31's synthesized URL (Spark side; [[t17UrlSql]] is the
    * DuckDB spelling — keep in lockstep). */
  private[graft] def t17Url: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    concat(
      when(id % 3 === 0, "HTTPS").otherwise("http"), lit("://"),
      when(id % 13 === 0, "user:pw@").otherwise(""),
      element_at(typedLit(T17Hosts), (id % 7 + 1).cast("int")),
      when(id % 11 === 0, ".").otherwise(""),
      when(id % 4 === 0, ":443")
        .when(id % 4 === 1, ":8080").otherwise(""),
      lit("/p/"), id.cast("string"),
      when(id % 5 === 0, "?q=1&u=2").otherwise(""),
      when(id % 6 === 0, "#frag").otherwise(""))
  }

  private[queries] def t17UrlSql: String = {
    val hostCase = T17Hosts.zipWithIndex
      .map { case (h, i) => s"WHEN $i THEN '$h'" }.mkString(" ")
    s"""CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END || '://' ||
       |CASE WHEN doc_id % 13 = 0 THEN 'user:pw@' ELSE '' END ||
       |CASE doc_id % 7 $hostCase END ||
       |CASE WHEN doc_id % 11 = 0 THEN '.' ELSE '' END ||
       |CASE WHEN doc_id % 4 = 0 THEN ':443'
       |     WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END ||
       |'/p/' || doc_id ||
       |CASE WHEN doc_id % 5 = 0 THEN '?q=1&u=2' ELSE '' END ||
       |CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END""".stripMargin
  }

  private def t17OracleSql: String = {
    import graft.functions.Urls
    s"""WITH u AS (SELECT doc_id, $t17UrlSql AS url FROM documents),
       |hh AS (SELECT doc_id, url, ${Urls.hostSql("url")} AS host FROM u)
       |SELECT doc_id,
       |  ${Urls.normalizeSql("url")} AS url_norm,
       |  host,
       |  ${Urls.registeredDomainSql("host")} AS domain
       |FROM hh""".stripMargin
  }

  private def t16OracleSql: String =
    s"""WITH ${htmlExtractCtes("")}
       |SELECT doc_id, text, n_lines_kept, n_lines_dropped FROM xt""".stripMargin

  private def bpeOracleSql(merges: Int): String = {
    def iteration(k: Int): String = {
      val p = k - 1
      s""",
         |p$k AS MATERIALIZED (
         |  SELECT pr.l AS l, pr.r AS r, sum(c) AS pc FROM (
         |    SELECT unnest(list_transform(range(1, len(s)),
         |             i -> {'l': s[i], 'r': s[i+1]})) AS pr, c
         |    FROM w$p WHERE len(s) >= 2)
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (
         |  SELECT l, r, pc FROM p$k ORDER BY pc DESC, l, r LIMIT 1),
         |m$k AS MATERIALIZED (
         |  SELECT w, i FROM (
         |    SELECT q.w, q.i,
         |           row_number() OVER (PARTITION BY q.w, q.i - q.rn
         |                              ORDER BY q.i) AS rr
         |    FROM (SELECT t.w, t.i,
         |                 row_number() OVER (PARTITION BY t.w
         |                                    ORDER BY t.i) AS rn
         |          FROM (SELECT w, s, unnest(range(1, len(s))) AS i
         |                FROM w$p) t, b$k b
         |          WHERE t.s[t.i] = b.l AND t.s[t.i+1] = b.r) q)
         |  WHERE rr % 2 = 1),
         |w$k AS MATERIALIZED (
         |  SELECT pos.w, pos.c,
         |         list(pos.v ORDER BY pos.q)
         |           FILTER (WHERE pos.v IS NOT NULL) AS s
         |  FROM (
         |    SELECT t.w, t.c, t.q,
         |           CASE WHEN mq.i IS NOT NULL THEN (SELECT l || r FROM b$k)
         |                WHEN mp.i IS NOT NULL THEN NULL
         |                ELSE t.s[t.q] END AS v
         |    FROM (SELECT w, c, s, unnest(range(1, len(s) + 1)) AS q
         |          FROM w$p) t
         |    LEFT JOIN m$k mq ON t.w = mq.w AND t.q = mq.i
         |    LEFT JOIN m$k mp ON t.w = mp.w AND t.q = mp.i + 1) pos
         |  GROUP BY pos.w, pos.c)""".stripMargin
    }
    val base =
      """WITH base AS MATERIALIZED (
        |  SELECT w, count(*) AS c
        |  FROM (SELECT unnest(string_split(trim(text), ' ')) AS w
        |        FROM documents)
        |  WHERE len(w) > 0 GROUP BY w),
        |w0 AS MATERIALIZED (
        |  SELECT w, c, list_append(string_split(w, ''), '</w>') AS s
        |  FROM base)""".stripMargin
    val rounds = (1 to merges).map(iteration).mkString
    val union = (1 to merges).map(k =>
      s"""SELECT CAST($k AS INT) AS rank, l AS "left", r AS "right",
         |       l || r AS merged, CAST(pc AS BIGINT) AS pair_count
         |FROM b$k""".stripMargin).mkString("\nUNION ALL ")
    s"$base$rounds\nSELECT * FROM (\n$union) ORDER BY rank"
  }

  /** The t14 oracle: the same unrolled training chain, finished by
    * tokenizing the corpus against the final segmentation w{merges} —
    * per-doc sum of segment lengths, character fallback (len+1, the
    * `</w>` marker) for words outside the vocabulary, zero for
    * wordless docs. */
  /** The full BPE train CTE chain (vocabulary + all merge rounds, no
    * final SELECT) — shared by the t14 oracle and pipe24's composed
    * corpus-build oracle. Starts with `WITH `; the final segmentation
    * table is `w<merges>`. */
  private[queries] def bpeChainSql(merges: Int): String = {
    val train = bpeOracleSql(merges)
    train.substring(0, train.indexOf("\nSELECT * FROM ("))
  }

  /** The t15 token-id CTE chain (BPE train chain + vocab id table +
    * the per-word/per-symbol position stream, no final SELECT) —
    * shared by the t15 oracle and pipe25's packed-batch oracle. Ends
    * with CTEs `vocab` (sym → dense 1-based binary-rank id) and `ts2`
    * (doc_id, wpos, spos, sym). */
  private[queries] def tokenIdsChainSql(m: Int): String = {
    val chain = bpeChainSql(m)
    s"""$chain,
       |vocab AS (
       |  SELECT sym, CAST(row_number() OVER (ORDER BY sym) AS BIGINT)
       |    AS token_id
       |  FROM (SELECT DISTINCT unnest(s) AS sym FROM w$m)),
       |tb AS (
       |  SELECT doc_id, list_filter(string_split(trim(text), ' '),
       |    x -> len(x) > 0) AS t
       |  FROM documents),
       |tw AS (
       |  SELECT doc_id, unnest(range(0, len(t))) AS wpos, t FROM tb),
       |tws AS (SELECT doc_id, wpos, t[wpos + 1] AS w FROM tw),
       |tsg AS (
       |  SELECT d.doc_id, d.wpos,
       |    coalesce(wf.s, list_append(
       |      list_transform(range(0, len(d.w)),
       |        i -> substr(d.w, CAST(i + 1 AS INT), 1)),
       |      '</w>')) AS s
       |  FROM tws d LEFT JOIN w$m wf ON d.w = wf.w),
       |tsy AS (
       |  SELECT doc_id, wpos, unnest(range(0, len(s))) AS spos, s
       |  FROM tsg),
       |ts2 AS (SELECT doc_id, wpos, spos, s[spos + 1] AS sym FROM tsy)"""
      .stripMargin
  }

  private def bpeTokensOracleSql(merges: Int): String = {
    val chain = bpeChainSql(merges)
    s"""$chain,
       |dw AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
       |    FROM documents)
       |  WHERE len(w) > 0),
       |agg AS (
       |  SELECT dw.doc_id,
       |         sum(coalesce(len(wf.s), len(dw.w) + 1)) AS n
       |  FROM dw LEFT JOIN w$merges wf ON dw.w = wf.w
       |  GROUP BY dw.doc_id)
       |SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_bpe_tokens
       |FROM (SELECT DISTINCT doc_id FROM documents) d
       |LEFT JOIN agg USING (doc_id)""".stripMargin
  }

  /** e13/e14's integer-quantized embedding view (floor(x·1000 + 0.5)):
    * every downstream distance is exact integer arithmetic. */
  private def quantizedEmb(s: org.apache.spark.sql.SparkSession,
                           d: String): org.apache.spark.sql.DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 1000 + 0.5)).as("qv"))

  /** Distinct-stopword hit count — list_intersect dedups in both
    * engines (set semantics), mirroring Spark's array_intersect.
    * Shared with FeedQueries' pipe9 oracle (LISSA language detection
    * runs the same profiles over the abstract). Expects a `toks`
    * list column in scope. */

  /** The portable IVF-PQ oracle, shared by e13 (in-memory model) and
    * e14 (the same model through the persisted IndexStore artifact) —
    * store round-trip fidelity is gated by result equality. */
  private val IvfPqPortableOracleSql =
    """WITH e AS (SELECT vec_id,
        |             list_transform(CAST(embedding AS DOUBLE[]),
        |                            x -> floor(x * 1000 + 0.5)) AS v
        |           FROM embeddings),
        |sc AS (SELECT CAST(vec_id AS VARCHAR) AS cluster, v AS centroid
        |       FROM e ORDER BY vec_id LIMIT 8),
        |asg AS (SELECT vec_id, cluster FROM (
        |          SELECT e.vec_id, sc.cluster, row_number() OVER (
        |            PARTITION BY e.vec_id ORDER BY
        |              (list_sum(list_transform(range(0, 64),
        |                 i -> e.v[i+1] * sc.centroid[i+1]))
        |               / (sqrt(list_sum(list_transform(e.v, x -> x * x))) *
        |                  sqrt(list_sum(list_transform(sc.centroid,
        |                    x -> x * x))))) DESC,
        |              lpad(cluster, 24, '0')) AS rn
        |          FROM e CROSS JOIN sc) WHERE rn = 1),
        |res AS (SELECT e.vec_id, a.cluster,
        |          list_transform(range(0, 64),
        |            i -> e.v[i+1] - sc.centroid[i+1]) AS rv
        |        FROM e JOIN asg a ON e.vec_id = a.vec_id
        |        JOIN sc ON sc.cluster = a.cluster),
        |seeds AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id)
        |            AS INT) - 1 AS code
        |          FROM res ORDER BY vec_id LIMIT 16),
        |grid AS (SELECT unnest(range(0, 8)) AS j),
        |cb AS (SELECT CAST(grid.j AS INT) AS subspace, s.code,
        |         r.rv[grid.j*8+1 : grid.j*8+8] AS c
        |       FROM seeds s JOIN res r ON r.vec_id = s.vec_id CROSS JOIN grid),
        |sv AS (SELECT r.vec_id, r.cluster, CAST(grid.j AS INT) AS subspace,
        |         r.rv[grid.j*8+1 : grid.j*8+8] AS sv
        |       FROM res r CROSS JOIN grid),
        |assign AS (SELECT vec_id, cluster, subspace, code FROM (
        |             SELECT sv.vec_id, sv.cluster, sv.subspace, cb.code,
        |               row_number() OVER (
        |                 PARTITION BY sv.vec_id, sv.subspace ORDER BY
        |                   list_sum(list_transform(range(0, 8),
        |                     i -> (sv.sv[i+1] - cb.c[i+1]) *
        |                          (sv.sv[i+1] - cb.c[i+1]))), cb.code) AS rn
        |             FROM sv JOIN cb ON sv.subspace = cb.subspace)
        |           WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        |pr AS (SELECT query_id, cluster,
        |         list_transform(range(0, 64),
        |           i -> qv[i+1] - centroid[i+1]) AS qr
        |       FROM (
        |         SELECT q.query_id, q.qv, sc.cluster, sc.centroid,
        |           row_number() OVER (PARTITION BY q.query_id ORDER BY
        |             (list_sum(list_transform(range(0, 64),
        |                i -> q.qv[i+1] * sc.centroid[i+1]))
        |              / (sqrt(list_sum(list_transform(q.qv, x -> x * x))) *
        |                 sqrt(list_sum(list_transform(sc.centroid,
        |                   x -> x * x))))) DESC,
        |             sc.cluster) AS crank
        |         FROM q CROSS JOIN sc) WHERE crank <= 3),
        |qsv AS (SELECT pr.query_id, pr.cluster, CAST(grid.j AS INT) AS subspace,
        |          pr.qr[grid.j*8+1 : grid.j*8+8] AS sv
        |        FROM pr CROSS JOIN grid),
        |lut AS (SELECT qsv.query_id, qsv.cluster, qsv.subspace, cb.code,
        |          CAST(list_sum(list_transform(range(0, 8),
        |            i -> (qsv.sv[i+1] - cb.c[i+1]) *
        |                 (qsv.sv[i+1] - cb.c[i+1]))) AS BIGINT) * 1000000 AS dq
        |        FROM qsv JOIN cb ON qsv.subspace = cb.subspace),
        |scored AS (SELECT l.query_id, a.vec_id AS neighbor_id,
        |             sum(l.dq) AS s
        |           FROM assign a
        |           JOIN lut l ON a.cluster = l.cluster
        |             AND a.subspace = l.subspace AND a.code = l.code
        |           WHERE l.query_id <> a.vec_id
        |           GROUP BY l.query_id, a.vec_id),
        |short AS (SELECT query_id, neighbor_id FROM (
        |            SELECT *, row_number() OVER (PARTITION BY query_id
        |              ORDER BY s, neighbor_id) AS rn
        |            FROM scored) WHERE rn <= 20),
        |rr AS (SELECT sh.query_id, sh.neighbor_id,
        |         list_sum(list_transform(range(0, 64),
        |           i -> (eq.v[i+1] - en.v[i+1]) * (eq.v[i+1] - en.v[i+1])))
        |           AS dist
        |       FROM short sh
        |       JOIN e eq ON eq.vec_id = sh.query_id
        |       JOIN e en ON en.vec_id = sh.neighbor_id)
        |SELECT query_id, neighbor_id, rank, dist
        |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |        ORDER BY dist, neighbor_id) AS INT) AS rank
        |      FROM rr)
        |WHERE rank <= 5""".stripMargin

  private[queries] def langHitsSql(lang: String): String = {
    val words = sqlList(TextAnalysis.LangProfiles(lang))
    s"len(list_intersect(toks, $words))"
  }
}
