package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Streaming ops over a MemoryStream: watermark drops late data,
  * sessionization closes on gap. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked windowed counts: on-time aggregates appear, too-late rows dropped") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val counts = EventStreams.windowedCounts(
      input.toDF(), windowLen = "10 minutes", lateness = "5 minutes")
    val q = counts.writeStream.format("memory")
      .queryName("wc").outputMode("append").start()

    // Batch 1: two events in [10:00,10:10), watermark advances to 10:25.
    input.addData(
      Event(1, ts(1), 7, "click", 1.0),
      Event(2, ts(3), 7, "click", 2.0),
      Event(3, ts(30), 7, "click", 4.0))
    q.processAllAvailable()
    // Batch 2: a too-late event for the closed 10:00 window (ignored)
    // plus watermark push to finalize nothing new.
    input.addData(Event(4, ts(2), 7, "click", 100.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wc")
      .select(date_format(col("window_start"), "HH:mm").as("w"),
              col("cnt"), col("sum_value"))
      .as[(String, Long, Double)].collect().toSet
    // The 10:00 window was finalized with exactly the two on-time rows.
    assert(rows.contains(("10:00", 2L, 3.0)), rows.toString)
    assert(!rows.exists { case (_, _, s) => s >= 100.0 })
  }

  test("sessionization: gap closes sessions, state emits complete sessions") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapMs = 5 * 60 * 1000)
    val q = sessions.writeStream.format("memory")
      .queryName("sess").outputMode("append").start()

    // User 7: events at 10:01,10:03 (one session), then 10:30 (new
    // session after >5 min gap closes the first).
    input.addData(
      Event(1, ts(1), 7, "click", 1.0),
      Event(2, ts(3), 7, "view", 2.0))
    q.processAllAvailable()
    input.addData(Event(3, ts(30), 7, "click", 4.0))
    q.processAllAvailable()
    q.stop()

    val done = spark.table("sess")
      .select("user_id", "n_events", "sum_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(done == Set((7L, 2L, 3.0)), done.toString)
  }

  test("streaming fingerprint dedup drops within-watermark duplicates, keeps distinct") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Long)]
    val deduped = EventStreams.dedupByFingerprint(
      input.toDF().toDF("ts", "fp", "doc_id"), "ts", "fp",
      lateness = "10 minutes")
    val q = deduped.writeStream.format("memory")
      .queryName("dd").outputMode("append").start()
    input.addData(
      (ts(1), "fpA", 1L), (ts(2), "fpA", 2L), (ts(3), "fpB", 3L))
    q.processAllAvailable()
    // Same fingerprint again within the horizon: dropped.
    input.addData((ts(4), "fpA", 4L), (ts(5), "fpC", 5L))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dd").select("fp", "doc_id")
      .as[(String, Long)].collect().toSet
    assert(kept == Set(("fpA", 1L), ("fpB", 3L), ("fpC", 5L)))
  }

  test("media decode runs unchanged on a stream: image pool + video frame pool match the batch path per batch") {
    implicit val sc = spark.sqlContext
    import graft.plans.{AviCodec, ImageCodec, VideoCodec}
    // Real payloads: one PNG and one MJPEG video per id, encoded ahead
    // (the stream carries bytes, exactly like a binary-file source).
    // Odd ids ship their video as RIFF/AVI, even ids as photo-JPEG
    // MOV — both container walks must behave identically per batch.
    def png(id: Long): Array[Byte] = ImageCodec.encodePng(8, 8,
      (x, y) => ImageCodec.synthPixel(id, 8, x, y))
    def avi(id: Long): Array[Byte] = {
      val v = (id * 41 % 256).toInt
      val frame = AviCodec.encodeJpeg(16, 16,
        (_, _) => (v << 16) | (v << 8) | v)
      if (id % 2 == 1)
        AviCodec.encodeAviMjpeg(16, 16, 40000L, Seq(frame))
      else VideoCodec.encodeMovMjpeg(16, 16, 40000L, Seq(frame))
    }
    val input = MemoryStream[(Long, Array[Byte], Array[Byte])]
    val decoded = graft.llm.Multimodal.extractFeaturesImage(
        input.toDF().toDF("media_id", "content", "vid"), grid = 2)
      .withColumn("vframes",
        graft.llm.Multimodal.decodeVideoFrames(col("vid"), 2))
    val q = decoded.writeStream.format("memory")
      .queryName("md").outputMode("append").start()
    input.addData((1L, png(1), avi(1)), (2L, png(2), avi(2)))
    q.processAllAvailable()
    input.addData((3L, png(3), avi(3)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("md")
      .select(col("media_id"), col("features"),
        element_at(col("vframes"), 1).as("f0"))
      .as[(Long, Seq[Double], Seq[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    for (id <- 1L to 3L) {
      // Batch-path equality: the same expressions over a static frame.
      val batchImg = ImageCodec.decodeMeanPool(png(id), 2).toSeq
      assert(out(id)._1 == batchImg)
      val v = (id * 41 % 256).toInt
      assert(out(id)._2 == Seq.fill(12)(v / 255.0))
    }
  }

  test("expression-config license tagging + static OA semi-join run unchanged on a stream") {
    import graft.license._
    import graft.license.FilterExpr._
    implicit val sc = spark.sqlContext
    // (id, source_id, collection, issn)
    val input = MemoryStream[(Long, String, String, String)]
    val recs = input.toDF().toDF("id", "sid", "coll", "issn")
      .withColumn("colls", array($"coll"))
      .withColumn("issns", array($"issn"))
      .withColumn("subjects", array().cast("array<string>"))
      .withColumn("rdate", lit("2020-01-01").cast("date"))
    val cols = RecordCols(id = col("id"), sourceId = col("sid"),
      collections = col("colls"), issns = col("issns"),
      subjects = col("subjects"), date = col("rdate"))
    val configs = Map(
      "ISIL-A" -> And(Seq(SourceIn(Seq("49")), CollectionIn(Seq("c1")))))
    val oa = Seq("1111-1111").toDF("issn") // static whitelist
    val tagged = Licensing.tag(recs, cols, configs, Map.empty, "2020-06-01")
      .join(org.apache.spark.sql.functions.broadcast(oa), Seq("issn"), "left_semi")
    val q = tagged.writeStream.format("memory")
      .queryName("lt").outputMode("append").start()
    input.addData(
      (1L, "49", "c1", "1111-1111"),  // tagged + OA -> kept, labeled
      (2L, "49", "c2", "1111-1111"),  // wrong collection -> kept, unlabeled
      (3L, "49", "c1", "2222-2222"))  // not OA -> dropped by semi-join
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("lt").select($"id", $"x_labels")
      .as[(Long, Seq[String])].collect().toMap
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(1L) == Seq("ISIL-A") && rows(2L).isEmpty)
  }

  test("foreachBatch holdings tagging matches the batch operator exactly") {
    import graft.license._
    import graft.license.FilterExpr._
    implicit val sc = spark.sqlContext
    // (id, issn, date)
    val input = MemoryStream[(Long, String, String)]
    val recs = input.toDF().toDF("id", "issn", "rd")
      .withColumn("sid", lit("49"))
      .withColumn("colls", array().cast("array<string>"))
      .withColumn("issns", array($"issn"))
      .withColumn("subjects", array().cast("array<string>"))
      .withColumn("rdate", $"rd".cast("date"))
    val cols = RecordCols(id = col("id"), sourceId = col("sid"),
      collections = col("colls"), issns = col("issns"),
      subjects = col("subjects"), date = col("rdate"))
    val holdings = Map("h1" -> Seq(
      ("1111-1111", "2019-01-01", "2021-12-31", 0),
      ("3333-3333", "2019-01-01", null.asInstanceOf[String], 365))
      .toDF("issn", "date_first", "date_last", "embargo_days"))
    val configs: Map[String, FilterExpr] =
      Map("ISIL-H" -> Holdings(Seq("h1")))

    val batchRows = Seq(
      (1L, "1111-1111", "2020-06-01"), // in coverage -> labeled
      (2L, "1111-1111", "2022-06-01"), // past date_last -> unlabeled
      (3L, "3333-3333", "2020-06-01"), // open range, clears 365d wall
      (4L, "3333-3333", "2024-09-01"), // inside embargo wall -> unlabeled
      (5L, "9999-9999", "2020-06-01")) // unknown issn -> unlabeled
    val asOf = "2025-01-01"

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-slt").toString
    input.addData(batchRows: _*)
    val q = graft.streaming.StreamingLicense.start(
      recs, cols, configs, holdings, asOf, ckpt) { (tagged, _) =>
      got.synchronized {
        got ++= tagged.select($"id", $"x_labels")
          .as[(Long, Seq[String])].collect()
      }
    }
    q.awaitTermination()

    val expected = Licensing.tag(
      batchRows.toDF("id", "issn", "rd")
        .withColumn("sid", lit("49"))
        .withColumn("colls", array().cast("array<string>"))
        .withColumn("issns", array($"issn"))
        .withColumn("subjects", array().cast("array<string>"))
        .withColumn("rdate", $"rd".cast("date")),
      cols, configs, holdings, asOf)
      .select($"id", $"x_labels").as[(Long, Seq[String])].collect()

    assert(got.toMap == expected.toMap)
    assert(got.toMap.view.filterKeys(Set(1L, 3L)).toMap ==
      Map(1L -> Seq("ISIL-H"), 3L -> Seq("ISIL-H")))
    val gotMap = got.toMap
    assert(Set(2L, 4L, 5L).forall(id => gotMap(id).isEmpty))
  }

  test("streaming incremental embedding dedup serves the persisted bucket store per batch, batch-equal") {
    implicit val sc = spark.sqlContext
    import graft.llm.{Dedup, Similarity}
    val emb = Tables.embeddings(spark, TestSpark.Sf)
      .filter(col("vec_id") < 2000).select("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") % 4 =!= 0)
    val base = java.nio.file.Files.createTempDirectory("graft-sed")
    corpus.select(col("vec_id").as("doc"), col("embedding").as("v"),
        posexplode(Similarity.lshBucketsAll(spark, col("embedding"),
          4, 6, 64)).as(Seq("tbl", "bkt")))
      .write.parquet(base.resolve("buckets").toString)
    try {
      val buckets = spark.read.parquet(base.resolve("buckets").toString)
      // The RELEASABLE form — a streaming loop runs the operator once
      // per micro-batch over fresh data, so each invocation's internal
      // cache must be released after materialization or the
      // CacheManager pins one dataset per batch forever.
      def incOpCollect(df: org.apache.spark.sql.DataFrame)
          : Seq[(Long, Long, Double)] = {
        val (pairs, release) =
          Dedup.embeddingNearDupPairsIncrementalReleasable(df.limit(0),
            df, "vec_id", "embedding", 0.4, planes = 6, tables = 4,
            dim = 64, corpusBuckets = Some(buckets))
        try pairs.as[(Long, Long, Double)].collect().toSeq
        finally release()
      }
      val rows = emb.filter(col("vec_id") % 4 === 0)
        .as[(Long, Seq[Float])].collect().toSeq
      val (b1, b2) = rows.splitAt(rows.length / 2)
      val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
      val input = MemoryStream[(Long, Seq[Float])]
      val q = input.toDF().toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val p = incOpCollect(batch)
            got.synchronized { got ++= p }
            ()
        }.start()
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      // Batch-equal per batch: each micro-batch pairs against the SAME
      // standing store a batch run would, so the union over batches
      // equals the union of per-split batch runs.
      def toDf(s: Seq[(Long, Seq[Float])]) =
        s.toDF("vec_id", "embedding")
          .withColumn("embedding", col("embedding").cast("array<float>"))
      val expected =
        incOpCollect(toDf(b1)).toSet ++ incOpCollect(toDf(b2)).toSet
      assert(got.toSet == expected && expected.nonEmpty)
    } finally graft.queries.Fixtures.deleteRecursively(base)
  }

  test("streaming incremental dedup over two rounds equals the full batch pair set") {
    implicit val sc = spark.sqlContext
    val all = Tables.documents(spark, TestSpark.Sf).filter(col("doc_id") < 120)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val r1 = all.filter(_._1 < 40)
    val r2 = all.filter(t => t._1 >= 40 && t._1 < 80)
    val r3 = all.filter(_._1 >= 80)

    val base = java.nio.file.Files.createTempDirectory("graft-sdd")
    val corpusDir = base.resolve("corpus").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    def round(input: MemoryStream[(Long, String)], ckpt: String,
              rows: Seq[(Long, String)]): Unit = {
      input.addData(rows: _*)
      val q = graft.streaming.StreamingDedup.start(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        corpusDir, ckpt, threshold = 0.8, bands = 8, rowsPerBand = 4) {
        (pairs, _) =>
          got.synchronized {
            got ++= pairs.as[(Long, Long, Double)].collect()
          }
      }
      q.awaitTermination()
    }
    // Rounds 1+2 share a checkpoint (the restart/replay path); round 3
    // runs with a FRESH checkpoint and stream over the same store —
    // its batchIds restart at 0, and it must still see rounds 1+2 as
    // corpus (checkpoint-namespaced store dirs) for the totals to add
    // up to the full batch pair set.
    val sameCkpt = base.resolve("ckpt").toString
    val input12 = MemoryStream[(Long, String)]
    round(input12, sameCkpt, r1)
    round(input12, sameCkpt, r2)
    round(MemoryStream[(Long, String)], base.resolve("ckpt2").toString, r3)

    val full = graft.llm.Dedup.minhashLshPairs(
        Tables.documents(spark, TestSpark.Sf).filter(col("doc_id") < 120),
        "doc_id", "text", threshold = 0.8, bands = 8, rowsPerBand = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.toSet == full)
    assert(got.size == got.toSet.size, "a pair was emitted twice")
    // the fresh-checkpoint round must pair against the earlier runs'
    // store, and the same-checkpoint rounds against each other
    assert(full.exists { case (a, b, _) => a < 80 && b >= 80 },
      "fixture has no cross-checkpoint pair — store continuity untested")
    assert(full.exists { case (a, b, _) => a < 40 && b >= 40 && b < 80 },
      "fixture has no cross-round pair — equivalence would be weak")

    // The corpus side of every round above was signed from the
    // persisted _bands store (corpusBands), so the store must hold one
    // band dir per committed batch under the parameter sidecar.
    val bandsRoot = s"$corpusDir/${graft.streaming.StreamingDedup.BandsSubdir}"
    assert(graft.streaming.CorpusStore.listMembers(spark, bandsRoot)
      .size == 3)
    assert(graft.llm.BandStore.readParams(spark, bandsRoot)
      .contains(graft.llm.BandStore.Params(1, 8, 4, portable = false)))

    // Starting a stream with a DIFFERENT hash family against the same
    // store must fail loudly (a silent mismatch would drop every
    // cross-batch pair) — and fail FAST, synchronously from start(),
    // before any checkpoint state exists.
    val badInput = MemoryStream[(Long, String)]
    badInput.addData(all.take(2): _*)
    val e = intercept[IllegalStateException] {
      graft.streaming.StreamingDedup.start(
        badInput.toDF().toDF("doc_id", "text"), "doc_id", "text",
        corpusDir, base.resolve("ckpt3").toString,
        threshold = 0.8, bands = 16, rowsPerBand = 8) { (_, _) => () }
    }
    assert(e.getMessage.contains("hash family"), e.getMessage)

    // Takedown: removing ids from both store halves leaves the next
    // round identical to an incremental run over the surviving corpus.
    val dropIds = Seq(10L, 45L, 90L, 100L).toDF("doc_id")
    graft.streaming.StreamingDedup.deleteDocs(spark, corpusDir,
      "doc_id", dropIds)
    val nextDocs = Tables.documents(spark, TestSpark.Sf)
      .filter(col("doc_id") >= 120 && col("doc_id") < 140)
      .select("doc_id", "text")
    val survivors = Tables.documents(spark, TestSpark.Sf)
      .filter(col("doc_id") < 120)
      .filter(!col("doc_id").isin(10L, 45L, 90L, 100L))
      .select("doc_id", "text")
    val expected = graft.llm.Dedup.minhashLshPairsIncremental(
        survivors, nextDocs, "doc_id", "text", threshold = 0.8,
        bands = 8, rowsPerBand = 4)
      .as[(Long, Long, Double)].collect().toSet
    val got4 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val input4 = MemoryStream[(Long, String)]
    input4.addData(nextDocs.as[(Long, String)].collect().toSeq: _*)
    val q4 = graft.streaming.StreamingDedup.start(
      input4.toDF().toDF("doc_id", "text"), "doc_id", "text",
      corpusDir, base.resolve("ckpt4").toString,
      threshold = 0.8, bands = 8, rowsPerBand = 4) { (pairs, _) =>
      got4.synchronized { got4 ++= pairs.as[(Long, Long, Double)].collect() }
    }
    q4.awaitTermination()
    assert(got4.toSet == expected)
    assert(expected.nonEmpty, "takedown fixture produced no pairs — vacuous")
    assert(!got4.exists { case (a, b, _) =>
      Set(10L, 45L, 90L, 100L).contains(a) || Set(10L, 45L, 90L, 100L).contains(b) })

    // Retention: expiring ckpt4's run namespace removes its documents
    // AND band rows from the store, so the next round equals an
    // incremental run over the corpus without that run's docs (the
    // survivors of the takedown above).
    graft.streaming.StreamingDedup.expireRun(spark, corpusDir, "doc_id",
      Seq(graft.streaming.StreamingDedup.runNamespace(
        base.resolve("ckpt4").toString)))
    val next5 = Tables.documents(spark, TestSpark.Sf)
      .filter(col("doc_id") >= 140 && col("doc_id") < 150)
      .select("doc_id", "text")
    val expected5 = graft.llm.Dedup.minhashLshPairsIncremental(
        survivors, next5, "doc_id", "text", threshold = 0.8,
        bands = 8, rowsPerBand = 4)
      .as[(Long, Long, Double)].collect().toSet
    val got5 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val input5 = MemoryStream[(Long, String)]
    input5.addData(next5.as[(Long, String)].collect().toSeq: _*)
    val q5 = graft.streaming.StreamingDedup.start(
      input5.toDF().toDF("doc_id", "text"), "doc_id", "text",
      corpusDir, base.resolve("ckpt5").toString,
      threshold = 0.8, bands = 8, rowsPerBand = 4) { (pairs, _) =>
      got5.synchronized { got5 ++= pairs.as[(Long, Long, Double)].collect() }
    }
    q5.awaitTermination()
    assert(expected5.nonEmpty, "retention fixture produced no pairs — vacuous")
    assert(got5.toSet == expected5)
    assert(!got5.exists { case (a, b, _) =>
      (a >= 120 && a < 140) || (b >= 120 && b < 140) },
      "expired run's documents still pairing")
    graft.queries.Fixtures.deleteRecursively(base)
  }

  test("stream start backfills band rows for doc batches that are missing them") {
    implicit val sc = spark.sqlContext
    val docs = Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-sddb")
    val corpusDir = base.resolve("corpus").toString
    val bandsRoot = s"$corpusDir/${graft.streaming.StreamingDedup.BandsSubdir}"

    // An ABANDONED run's committed doc batch with no band rows — the
    // crash-between-writes / pre-_bands-layout desync: the corpus is
    // never re-signed, so without the guard these docs never pair.
    val orphan = docs.filter(col("doc_id") < 40)
    orphan.write.parquet(s"$corpusDir/run=deadbeef_batch=0")

    def stream(ckpt: String, rows: Seq[(Long, String)]): Set[(Long, Long, Double)] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      val input = MemoryStream[(Long, String)]
      input.addData(rows: _*)
      val q = graft.streaming.StreamingDedup.start(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        corpusDir, ckpt, threshold = 0.8, bands = 8, rowsPerBand = 4) {
        (pairs, _) =>
          got.synchronized { got ++= pairs.as[(Long, Long, Double)].collect() }
      }
      q.awaitTermination()
      got.toSet
    }

    val next = docs.filter(col("doc_id") >= 40 && col("doc_id") < 80)
    val expected = graft.llm.Dedup.minhashLshPairsIncremental(
        orphan, next, "doc_id", "text", threshold = 0.8,
        bands = 8, rowsPerBand = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty, "fixture has no orphan-vs-batch pair — vacuous")
    val got = stream(base.resolve("ckpt").toString,
      next.as[(Long, String)].collect().toSeq)
    assert(got == expected,
      "orphan doc batch did not pair — band backfill missing")
    assert(graft.streaming.CorpusStore.listMembers(spark, bandsRoot)
      .exists(m => m.ns == "deadbeef" && m.batch == 0L),
      "backfilled band dir not written")

    // Same desync with the doc batch already COMPACTED (raw dir gone,
    // rows only reachable through provenance columns): delete the
    // backfilled band dir, compact the document half, and the next
    // start must rebuild the band rows from the compacted rows.
    graft.streaming.CorpusStore.compact(spark, corpusDir, "doc_id")
    val fs = graft.streaming.CorpusStore.fileSystem(spark, bandsRoot)
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      s"$bandsRoot/run=deadbeef_batch=0"), true))
    val next2 = docs.filter(col("doc_id") >= 80 && col("doc_id") < 120)
    val corpusSoFar = docs.filter(col("doc_id") < 80)
    val expected2 = graft.llm.Dedup.minhashLshPairsIncremental(
        corpusSoFar, next2, "doc_id", "text", threshold = 0.8,
        bands = 8, rowsPerBand = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(expected2.exists { case (a, b, _) => math.min(a, b) < 40 },
      "fixture has no compacted-orphan pair — provenance branch untested")
    val got2 = stream(base.resolve("ckpt2").toString,
      next2.as[(Long, String)].collect().toSeq)
    assert(got2 == expected2,
      "compacted orphan batch did not pair — provenance backfill broken")
    graft.queries.Fixtures.deleteRecursively(base)
  }

  test("sessionization: late in-watermark event bridges two open sessions, emission waits for watermark") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS(),
      gapMs = 5 * 60 * 1000, lateness = "15 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("sessb").outputMode("append").start()
    input.addData(Event(1, ts(0), 9, "click", 1.0))
    q.processAllAvailable()
    // Gap-exceeding event: opens a second accumulator but must NOT
    // force-emit the first (a straggler may still belong to it).
    input.addData(Event(3, ts(10), 9, "view", 4.0))
    q.processAllAvailable()
    assert(spark.table("sessb").count() == 0)
    // The straggler at 10:05 is within gap of BOTH accumulators and
    // bridges them into one session 10:00-10:10.
    input.addData(Event(2, ts(5), 9, "click", 2.0))
    q.processAllAvailable()
    // Far event advances the watermark past 10:15 -> bridged session emits.
    input.addData(Event(4, ts(59), 9, "click", 8.0))
    q.processAllAvailable()
    q.stop()
    val done = spark.table("sessb")
      .select("n_events", "sum_value").as[(Long, Double)].collect().toSet
    assert(done == Set((3L, 7.0)), done.toString)
  }

  test("streaming LM scoring equals the batch path; a store append lands at the batch boundary") {
    implicit val sc = spark.sqlContext
    import graft.llm.{Corpus, LmStore}
    val all = Tables.documents(spark, TestSpark.Sf)
      .filter(col("doc_id") < 300)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    val refA = all.filter(t => t._2 == "src0" && t._1 < 100)
    val refB = all.filter(t => t._2 == "src0" && t._1 >= 100)
    val stream1 = all.filter(_._1 < 150)
    val stream2 = all.filter(_._1 >= 150)
    assert(refA.nonEmpty && refB.nonEmpty)

    val base = java.nio.file.Files.createTempDirectory("graft-slm")
    val storeDir = "file:" + base.resolve("lm").toString
    val params = LmStore.Params(langCol = None, hashed = true)
    LmStore.build(refA.toDF("doc_id", "source", "text"),
      "doc_id", "text", storeDir, params)

    def batchScores(rows: Seq[(Long, String, String)],
                    ref: Seq[(Long, String, String)]) =
      Corpus.lmScoreWith(rows.toDF("doc_id", "source", "text"),
          "doc_id", "text",
          Corpus.lmTrain(ref.toDF("doc_id", "source", "text"),
            "doc_id", "text", hashed = true),
          hashed = true)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap

    val got = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    def round(ckpt: String, rows: Seq[(Long, String, String)]): Unit = {
      val input = MemoryStream[(Long, String, String)]
      input.addData(rows: _*)
      val q = graft.streaming.StreamingQuality.start(
        input.toDF().toDF("doc_id", "source", "text"), "doc_id", "text",
        storeDir, params, base.resolve(ckpt).toString) { (scored, _) =>
        got.synchronized {
          got ++= scored.as[(Long, Long, Long)].collect()
            .map(r => r._1 -> ((r._2, r._3)))
        }
      }
      q.awaitTermination()
    }

    // Round 1 scores under the A-only model == the batch operator.
    round("c1", stream1)
    assert(got.toMap == batchScores(stream1, refA))
    val r1 = got.toMap

    // Reference harvest lands between rounds: the NEXT batch scores
    // under the grown model (model refresh at the batch boundary).
    LmStore.append(refB.toDF("doc_id", "source", "text"),
      "doc_id", "text", storeDir, params)
    round("c2", stream2)
    val full = batchScores(stream2, refA ++ refB)
    assert(stream2.forall(t => got(t._1) == full(t._1)))
    // Round 1 results are untouched history (scored under A-only).
    assert(stream1.forall(t => got(t._1) == r1(t._1)))

    graft.queries.Fixtures.deleteRecursively(base)
  }

  test("streaming ANN search serves from the persisted index; maintenance lands at batch boundaries") {
    implicit val sc = spark.sqlContext
    import graft.llm.IndexStore
    // StoreSpec's integer-quantized view: exact integer arithmetic
    // downstream, so stream/batch comparisons are bit-safe.
    val emb = Tables.embeddings(spark, TestSpark.Sf)
      .select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * 1000 + 0.5)).as("qv")).cache()
    // The append round's unambiguous signal: CLONES of the query
    // vectors under fresh ids (vec_id + 1000) — once appended, each
    // query's rank-1 neighbor is its clone at distance 0 (the search
    // excludes only query_id == neighbor_id self-matches, not
    // distance-0 twins).
    val baseCorpus = emb.filter(col("vec_id") >= 10)
    val queryVecs = emb.filter(col("vec_id") < 5)
    val params = IndexStore.Params(dim = 64, clusters = 4, m = 8, k = 8)
    val base = java.nio.file.Files.createTempDirectory("graft-ssr")
    val dir = "file:" + base.resolve("ix").toString
    IndexStore.build(baseCorpus, "vec_id", "qv", dir, params, iters = 1)

    val qRows = queryVecs.as[(Long, Seq[Double])].collect().toSeq
    // Overscan large enough that the exact re-rank covers the probed
    // lists entirely: on these UNSTRUCTURED random embeddings the PQ
    // quantization error is the same magnitude as the inter-point
    // distances, so a small ADC shortlist can drop even a distance-0
    // match — the self-match assertion below needs the exact pass to
    // see it (the e13 fixtures pin determinism, not ADC recall).
    val Overscan = 400
    def batchSearch(): Set[(Long, Long, Int, Double)] =
      IndexStore.searchTopKRerank(spark, dir, params, emb,
          qRows.toDF("vec_id", "qv"), "vec_id", "qv", k = 3,
          nprobe = 2, overscan = Overscan)
        .as[(Long, Long, Int, Double)].collect().toSet

    val got = scala.collection.mutable.Set.empty[(Long, Long, Int, Double)]
    def round(ckpt: String,
              corpus: org.apache.spark.sql.DataFrame = emb)
        : Set[(Long, Long, Int, Double)] = {
      got.clear()
      val input = MemoryStream[(Long, Seq[Double])]
      input.addData(qRows: _*)
      val q = graft.streaming.StreamingSearch.start(
        input.toDF().toDF("vec_id", "qv"), "vec_id", "qv", dir, params,
        corpus, k = 3, base.resolve(ckpt).toString,
        overscan = Overscan) { (res, _) =>
        got.synchronized {
          got ++= res.as[(Long, Long, Int, Double)].collect()
        }
      }
      q.awaitTermination()
      got.toSet
    }

    // Round 1: the streaming batch equals the batch operator verbatim,
    // and the base index can only return ids it has indexed.
    val r1 = round("c1")
    assert(r1 == batchSearch() && r1.nonEmpty)
    assert(r1.forall { case (_, n, _, _) => n >= 10 })

    // Index growth lands between rounds: the NEXT batch searches the
    // grown inverted lists (swap at the batch boundary) — every query
    // now finds its appended clone at rank 1, distance 0.
    val clones = qRows.map { case (i, v) => (i + 1000L, v) }
    IndexStore.append(clones.toDF("vec_id", "qv"), "vec_id", "qv",
      dir, params)
    val embWithClones = emb.unionByName(clones.toDF("vec_id", "qv"))
    def batchSearchGrown(): Set[(Long, Long, Int, Double)] =
      IndexStore.searchTopKRerank(spark, dir, params, embWithClones,
          qRows.toDF("vec_id", "qv"), "vec_id", "qv", k = 3,
          nprobe = 2, overscan = Overscan)
        .as[(Long, Long, Int, Double)].collect().toSet
    val r2 = round("c2", corpus = embWithClones)
    assert(r2 == batchSearchGrown())
    for ((qid, _) <- qRows)
      assert(r2.contains((qid, qid + 1000L, 1, 0.0)),
        s"query $qid should find its clone after the append")

    // Takedown lands at the next boundary too: deleting the appended
    // ids restores the base lists exactly (append's exact inverse on
    // the codes component), so round 3 reproduces round 1.
    IndexStore.delete(spark, dir, clones.map(_._1).toDF("id"))
    val r3 = round("c3")
    assert(r3 == r1)

    graft.queries.Fixtures.deleteRecursively(base)
  }
  test("streaming tokenization serves from the persisted artifact; a retrain lands at the batch boundary") {
    implicit val sc = spark.sqlContext
    import graft.llm.{TextAnalysis, TokenizerStore}
    val all = Tables.documents(spark, TestSpark.Sf)
      .filter(col("doc_id") < 300 && col("text").isNotNull)
      .select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    val refA = all.filter(_._1 < 100)
    val refB = all.filter(t => t._1 >= 100 && t._1 < 200)
    val stream1 = all.filter(_._1 < 150)
    val stream2 = all.filter(_._1 >= 150)
    assert(refA.nonEmpty && refB.nonEmpty && stream2.nonEmpty)

    val base = java.nio.file.Files.createTempDirectory("graft-stok")
    val storeDir = "file:" + base.resolve("tok").toString
    val params = TokenizerStore.Params(merges = 6, minCount = 1L)
    TokenizerStore.build(refA.toDF("doc_id", "text"), "doc_id", "text",
      storeDir, params)

    def batchCounts(rows: Seq[(Long, String)],
                    ref: Seq[(Long, String)]): Map[Long, Long] =
      TextAnalysis.bpeTokenCountsWith(rows.toDF("doc_id", "text"),
          "doc_id", "text",
          TextAnalysis.bpeTrainFull(ref.toDF("doc_id", "text"),
            "doc_id", "text", params.merges, params.minCount)._2)
        .as[(Long, Long)].collect().toMap

    val got = scala.collection.mutable.Map.empty[Long, Long]
    def round(ckpt: String, rows: Seq[(Long, String)]): Unit = {
      val input = MemoryStream[(Long, String)]
      input.addData(rows: _*)
      val q = graft.streaming.StreamingTokenize.start(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        storeDir, params, base.resolve(ckpt).toString) { (counts, _) =>
        got.synchronized {
          got ++= counts.select("doc_id", "n_bpe_tokens")
            .as[(Long, Long)].collect()
        }
      }
      q.awaitTermination()
    }

    // Round 1 tokenizes under the A-trained vocabulary == the batch
    // operator serving from the same artifact.
    round("c1", stream1)
    val batchA = batchCounts(stream1, refA)
    assert(got.toMap == batchA)
    val r1 = got.toMap

    // A retrain on the grown reference lands between rounds: the NEXT
    // batch tokenizes under the new vocabulary (one-directory swap at
    // the batch boundary), and it must CHANGE some budgets -- a swap
    // that leaves every count identical would mean the test pinned
    // nothing.
    TokenizerStore.build((refA ++ refB).toDF("doc_id", "text"),
      "doc_id", "text", storeDir, params)
    round("c2", stream2)
    val batchAB = batchCounts(stream2, refA ++ refB)
    assert(stream2.forall(t => got(t._1) == batchAB(t._1)))
    // Round-1 results are untouched history (tokenized under A-only).
    assert(stream1.forall(t => got(t._1) == r1(t._1)))
    val batchA2 = batchCounts(stream2, refA)
    assert(stream2.exists(t => batchAB(t._1) != batchA2(t._1)))

    graft.queries.Fixtures.deleteRecursively(base)
  }

  test("streaming WARC ingestion equals the batch scan; landed files process exactly once") {
    import graft.sources.Warc
    val base = java.nio.file.Files.createTempDirectory("graft-swarc")
    val dir = base.resolve("drop"); java.nio.file.Files.createDirectory(dir)
    def resp(id: Long, body: String) =
      Warc.gzipMember(Warc.encodeRecord("response",
        s"http://example.org/doc/$id", "application/http;msgtype=response",
        Warc.encodeHttpResponse(200, "OK", "text/html",
          body.getBytes("UTF-8")), s"r-$id"))
    def drop(name: String, ids: Seq[Long]): Unit = {
      val out = java.nio.file.Files.newOutputStream(dir.resolve(name))
      try ids.foreach(i => out.write(resp(i, s"body of capture $i here")))
      finally out.close()
    }
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Int)]
    def round(): Unit = {
      val q = graft.streaming.StreamingWarc.start(spark, dir.toString,
        base.resolve("ckpt").toString) { (recs, _) =>
        got.synchronized {
          got ++= recs.select("target_uri", "http_status")
            .collect().map(r => (r.getString(0), 0L, r.getInt(1)))
        }
      }
      q.awaitTermination()
    }
    drop("a.warc.gz", Seq(1L, 2L))
    round()
    assert(got.map(_._1).sorted.toSeq == Seq(1L, 2L)
      .map(i => s"http://example.org/doc/$i"))
    // Second drop: only the NEW file's records arrive (the first file
    // is in the checkpointed file log — exactly-once discovery).
    drop("b.warc.gz", Seq(3L))
    round()
    assert(got.size == 3 && got.forall(_._3 == 200))
    // And the union equals the batch scan of the same directory.
    val batch = Warc.records(spark, dir.toString + "/*.warc.gz")
      .select("target_uri").as[String].collect().sorted.toSeq
    assert(got.map(_._1).sorted.toSeq == batch)
    graft.queries.Fixtures.deleteRecursively(base)
  }

  test("streaming HTML extraction equals the batch operator per micro-batch") {
    implicit val sc = spark.sqlContext
    import graft.llm.TextAnalysis
    val pages = Tables.documents(spark, TestSpark.Sf)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), concat(
        lit("<html><head><title>Doc overview page</title>"),
        lit("<script>var x = 1 < 2;</script></head><body>"),
        lit("<nav><a href='/'>Home</a> <a href='/a'>About</a> " +
          "<a href='/b'>More</a></nav>"),
        lit("<p>"), col("text"), lit("</p></body></html>")).as("html"))
      .as[(Long, String)].collect().toSeq
    val (s1, s2) = pages.partition(_._1 % 2 == 0)
    assert(s1.nonEmpty && s2.nonEmpty)
    val expected = TextAnalysis.htmlExtractStats(
        pages.toDF("doc_id", "html"), "html", native = true)
      .select("doc_id", "text", "n_lines_kept", "n_lines_dropped")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    val got =
      scala.collection.mutable.Map.empty[Long, (Long, String, Long, Long)]
    val base = java.nio.file.Files.createTempDirectory("graft-shtml")
    def round(ckpt: String, rows: Seq[(Long, String)]): Unit = {
      val input = MemoryStream[(Long, String)]
      input.addData(rows: _*)
      val q = graft.streaming.StreamingHtml.start(
        input.toDF().toDF("doc_id", "html"), "html",
        base.resolve(ckpt).toString) { (ex, _) =>
        got.synchronized {
          got ++= ex
            .select("doc_id", "text", "n_lines_kept", "n_lines_dropped")
            .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r)
        }
      }
      q.awaitTermination()
    }
    round("c1", s1)
    round("c2", s2)
    assert(got.toMap == expected)
    graft.queries.Fixtures.deleteRecursively(base)
  }

  test("pipe26 streaming round-trip: increments append from the watermark; standing placements never move") {
    import graft.llm.{Corpus, TokenizerStore}
    import graft.queries.PipelineQueries
    implicit val sc = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-p26")
    val storeDir = "file:" + base.resolve("tok")
    val params = TokenizerStore.Params(merges = 6, minCount = 1L)
    val docsDf = Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "lang", "text")
    // The FIXED artifact: trained once, never touched by a batch.
    TokenizerStore.build(docsDf, "doc_id", "text", storeDir, params)

    // Last night's standing corpus, packed from sequence 0.
    val standing = docsDf.filter(col("doc_id") % 16 =!= 0)
    type Placement = (Long, Int, Int, Int, Long)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Placement] =
      df.select(col("doc_id"), col("shard"), col("seq_idx"),
          col("tok_offset"), col("n_bpe_tokens"))
        .as[(Long, Int, Int, Int, Long)].collect().toSeq
    val basePlaced = rows(PipelineQueries.corpusBuild(standing,
      PipelineQueries.curationFunnelOf(standing, portableCov = true),
      storeDir, params, numShards = 4, budgetTokens = 256))
    assert(basePlaced.nonEmpty)

    // Two nightly increments stream in; each micro-batch funnels
    // itself, tokenizes from the FIXED store, and packs from the
    // carried watermark — the standing placements are never re-read.
    val placed = scala.collection.mutable.ArrayBuffer.empty[(Long, Placement)]
    def watermark(): Map[Int, Long] =
      (basePlaced ++ placed.map(_._2)).groupBy(_._2).map { case (sh, ps) =>
        sh -> ps.map(p => p._3.toLong * 256 + p._4 + p._5).max
      }
    val input = MemoryStream[(Long, String, String)]
    val inc = docsDf.filter(col("doc_id") % 16 === 0)
      .as[(Long, String, String)].collect().toSeq
    val (inc1, inc2) = inc.partition(_._1 % 32 == 0)
    assert(inc1.nonEmpty && inc2.nonEmpty)
    def round(batchRows: Seq[(Long, String, String)]): Unit = {
      input.addData(batchRows: _*)
      val wmDf = watermark().toSeq.toDF("shard", "n_tokens")
      val q = input.toDF().toDF("doc_id", "lang", "text").writeStream
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          val out = rows(PipelineQueries.corpusBuildAppend(batch,
            PipelineQueries.curationFunnelOf(
              batch.select("doc_id", "lang", "text"), portableCov = true),
            storeDir, params, numShards = 4, budgetTokens = 256, wmDf))
          placed.synchronized { placed ++= out.map((id, _)) }
          ()
        }
        .start()
      q.awaitTermination()
    }
    val wm0 = watermark()
    round(inc1)
    val afterB1 = placed.toList
    assert(afterB1.nonEmpty, "vacuous increment: no batch-1 survivors")
    round(inc2)
    assert(placed.size > afterB1.size, "vacuous increment: no batch-2 survivors")
    // Standing placements and batch-1 placements are immutable history:
    // batch 2 only ever APPENDED.
    assert(placed.toList.take(afterB1.size) == afterB1)

    // Every batch starts at its shard's sealed sequence boundary and
    // the occupied token ranges never overlap across builds — the
    // loader-visible guarantee that old shard files needn't be
    // rewritten. (Batch-2 boundaries derive from the ADVANCED
    // watermark, so this also pins the fold-forward rule.)
    val builds: Seq[(Map[Int, Long], Seq[Placement])] = Seq(
      (wm0, afterB1.map(_._2)),
      (afterB1.map(_._2).groupBy(_._2).map { case (sh, ps) =>
        sh -> math.max(wm0.getOrElse(sh, 0L),
          ps.map(p => p._3.toLong * 256 + p._4 + p._5).max)
      }.toMap ++ wm0.filterNot { case (sh, _) =>
        afterB1.exists(_._2._2 == sh) },
        placed.toList.drop(afterB1.size).map(_._2)))
    builds.foreach { case (wm, ps) =>
      ps.groupBy(_._2).foreach { case (sh, shardPs) =>
        val boundary = (wm.getOrElse(sh, 0L) + 255) / 256 * 256
        val starts = shardPs.map(p => p._3.toLong * 256 + p._4)
        assert(starts.min == boundary,
          s"shard $sh: append did not start at the sealed boundary")
      }
    }
    // Increment placements = packSequencesAppend batch-mode on the
    // same budgets (the streamed path adds no drift).
    val direct = rows(PipelineQueries.corpusBuildAppend(
      inc1.toDF("doc_id", "lang", "text"),
      PipelineQueries.curationFunnelOf(
        inc1.toDF("doc_id", "lang", "text"), portableCov = true),
      storeDir, params, numShards = 4, budgetTokens = 256,
      wm0.toSeq.toDF("shard", "n_tokens")))
    assert(afterB1.map(_._2).toSet == direct.toSet)

    graft.queries.Fixtures.deleteRecursively(base)
  }
}
