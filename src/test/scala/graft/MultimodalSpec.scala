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

  test("rebalanceBySize plans an AQE rebalance, no driver-side count") {
    val plan = Multimodal.rebalanceBySize(media)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("RebalancePartitions") ||
      plan.contains("rebalance"), plan)
    // rows and payload untouched
    assert(Multimodal.rebalanceBySize(media).count() == media.count())
  }
}
