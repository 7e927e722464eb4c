package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import graft.llm.Corpus

/** ScalaCheck properties for the sequence-pack family (SURVEY §5
  * discipline): the pipe26 fixtures exercise one corpus shape; these
  * pin the append contract under RANDOM budgets, shard counts, and
  * token distributions — including zero-token docs and shards the
  * standing corpus never touched. */
object CorpusProps extends Properties("Corpus") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  private type Placement = (Long, Int, Int, Int, Long)
  private def collectPlaced(df: org.apache.spark.sql.DataFrame)
      : Seq[Placement] =
    df.select(col("doc_id"), col("shard"), col("seq_idx"),
        col("tok_offset"), col("n"))
      // In the pack's own in-shard order (hash, doc_id) — zero-token
      // docs share their successor's position, so position order alone
      // cannot reconstruct the stream.
      .withColumn("__h", Corpus.stableHash(col("doc_id"), "p"))
      .orderBy("__h", "doc_id").drop("__h")
      .as[(Long, Int, Int, Int, Long)].collect().toSeq

  private val genCase = for {
    b <- Gen.choose(8, 64)
    shards <- Gen.choose(1, 5)
    baseTok <- Gen.nonEmptyListOf(Gen.choose(0L, 100L))
      .map(_.take(40))
    incTok <- Gen.nonEmptyListOf(Gen.choose(0L, 100L))
      .map(_.take(30))
  } yield (b, shards, baseTok, incTok)

  property("append starts at each shard's sealed boundary, packs densely, never overlaps standing placements") =
    Prop.forAll(genCase) { case (b, shards, baseTok, incTok) =>
      val base = baseTok.zipWithIndex
        .map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n")
      val inc = incTok.zipWithIndex
        .map { case (n, i) => (1000L + i, n) }.toDF("doc_id", "n")
      val basePacked = collectPlaced(
        Corpus.packSequences(base, "doc_id", col("n"), shards, b, "p"))
      val wm = Corpus.packWatermark(
        Corpus.packSequences(base, "doc_id", col("n"), shards, b, "p"),
        col("n"), b)
      val incPacked = collectPlaced(Corpus.packSequencesAppend(
        inc, "doc_id", col("n"), shards, b, "p", wm))

      def sp(p: Placement): Long = p._3.toLong * b + p._4
      val baseEnd = basePacked.groupBy(_._2).view
        .mapValues(ps => ps.map(p => sp(p) + p._5).max).toMap
      incPacked.length == incTok.length &&
        incPacked.groupBy(_._2).forall { case (sh, ps) =>
          // An untouched shard starts at 0; otherwise at the ceil
          // boundary of the standing corpus' last occupied token.
          val boundary =
            baseEnd.get(sh).map(e => (e + b - 1) / b * b).getOrElse(0L)
          // ps is already in the pack's (hash, doc_id) stream order:
          // each placement must sit exactly at the running prefix sum
          // from the boundary. Dense-from-boundary implies no overlap
          // with standing placements (boundary ≥ every standing end).
          val dense = ps.foldLeft((true, boundary)) {
            case ((ok, cur), p) => (ok && sp(p) == cur, cur + p._5)
          }._1
          sp(ps.head) == boundary && dense
        }
    }

  property("append from an empty watermark is exactly packSequences") =
    Prop.forAll(genCase) { case (b, shards, _, incTok) =>
      val inc = incTok.zipWithIndex
        .map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n")
      val wm0 = Seq.empty[(Int, Long)].toDF("shard", "n_tokens")
      collectPlaced(Corpus.packSequencesAppend(
        inc, "doc_id", col("n"), shards, b, "p", wm0)).toSet ==
        collectPlaced(Corpus.packSequences(
          inc, "doc_id", col("n"), shards, b, "p")).toSet
    }
}
