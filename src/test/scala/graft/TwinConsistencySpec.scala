package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Dedup, Similarity}

/** Production ↔ portable-twin drift guards.
  *
  * The no-oracle allowlist (PlanSpec) rests on each production path
  * having an oracle-checked portable twin that exercises the same
  * Scala code with a portable hash core / quantized input. That gate
  * covers the SHARED code — but an edit to a production-only branch
  * (the xxhash64 signature core, the native bucket Expression, the
  * float k-means path) would drift invisibly behind the allowlist.
  * These specs pin each production path's OUTPUT (pairs / top-k
  * neighbors — not its hashes) to its twin's on the test fixture:
  * both sides are exact-verified approximations of the same truth, so
  * their outputs must stay interchangeable within a measured band.
  *
  * Bounds are set from measured fixture values with margin; a genuine
  * production-path regression (wrong bit width, broken banding, a
  * hash swapped for a constant) lands orders of magnitude below them.
  */
class TwinConsistencySpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  private lazy val docs =
    Tables.documents(spark, Sf).filter(col("doc_id") < 200).cache()
  private lazy val emb = Tables.embeddings(spark, Sf).cache()
  private lazy val embBounded = emb.filter(col("vec_id") < 300).cache()
  private lazy val queries = emb.filter(col("vec_id") < 10)

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  /** Per-query neighbor sets of a top-k result. */
  private def topkSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  /** Mean per-query overlap |A∩B| / k between two top-k results. */
  private def meanOverlap(a: Map[Long, Set[Long]],
                          b: Map[Long, Set[Long]], k: Int): Double = {
    val qs = a.keySet ++ b.keySet
    qs.toSeq.map { q =>
      (a.getOrElse(q, Set.empty) & b.getOrElse(q, Set.empty)).size.toDouble / k
    }.sum / qs.size
  }

  test("d3/d9: minhash LSH pairs agree across xxhash and portable cores") {
    val prod = pairSet(Dedup.minhashLshPairs(docs, "doc_id", "text",
      threshold = 0.8, maxBucketSize = Some(100)))
    val twin = pairSet(Dedup.minhashLshPairs(docs, "doc_id", "text",
      threshold = 0.8, maxBucketSize = Some(100), portable = true))
    assert(prod.nonEmpty && twin.nonEmpty)
    // Both sides exact-verify candidates at the same threshold, so
    // each output is a subset of the true pair set and the hash family
    // only moves LSH recall at the margin.
    val jac = (prod & twin).size.toDouble / (prod | twin).size
    assert(jac >= 0.8, s"prod/twin pair drift: jaccard $jac " +
      s"(${prod.size} prod, ${twin.size} twin)")
  }

  test("d11/d14: OPH LSH pairs agree across xxhash and portable cores") {
    val prod = pairSet(Dedup.minhashLshPairsOph(docs, "doc_id", "text",
      threshold = 0.9, maxBucketSize = Some(100)))
    val twin = pairSet(Dedup.minhashLshPairsOph(docs, "doc_id", "text",
      threshold = 0.9, maxBucketSize = Some(100), portable = true))
    assert(prod.nonEmpty && twin.nonEmpty)
    val jac = (prod & twin).size.toDouble / (prod | twin).size
    assert(jac >= 0.7, s"OPH prod/twin pair drift: jaccard $jac " +
      s"(${prod.size} prod, ${twin.size} twin)")
  }

  test("d4/d5: simhash pair outputs share the hamming-0 core across hash cores") {
    // Simhash verification is over the fingerprint itself, so the
    // hamming-≤2 FRINGE is hash-family-dependent by design (measured
    // 31 vs 105 pairs on this corpus). The family-INDEPENDENT
    // invariant is the hamming-0 core: identical token multisets give
    // identical fingerprints under ANY per-token hash. Plant permuted
    // duplicates and require both cores to pair every one of them;
    // bound the fringe ratio so a degenerate production hash (e.g. a
    // constant — every doc pairs with every doc) still fails loudly.
    val planted = docs.select((col("doc_id") + 10000).as("doc_id"),
      concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
    val d2 = docs.select("doc_id", "text").union(planted)
    val mustPair = docs.select("doc_id").as[Long].collect()
      .map(i => (i, i + 10000)).toSet
    def pairs(portable: Boolean) =
      pairSet(Dedup.simhashNearDupPairs(d2, "doc_id", "text",
        bits = 32, blocks = 4, maxHamming = 2, portable = portable,
        maxBucketSize = Some(500)))
    val prod = pairs(portable = false)
    val twin = pairs(portable = true)
    assert(mustPair.subsetOf(prod), "production core missed planted dups")
    assert(mustPair.subsetOf(twin), "portable core missed planted dups")
    val ratio = prod.size.toDouble / twin.size
    assert(ratio > 0.1 && ratio < 10.0,
      s"prod/twin pair-count ratio $ratio (${prod.size} vs ${twin.size})")
  }

  test("d7/d13: embedding LSH near-dup pairs agree across hash families") {
    val prod = pairSet(Dedup.embeddingNearDupPairsLsh(embBounded,
      "vec_id", "embedding", threshold = 0.3, planes = 4))
    val twin = pairSet(Dedup.embeddingNearDupPairsLshPortable(embBounded,
      "vec_id", "embedding", threshold = 0.3, planes = 4))
    assert(prod.nonEmpty && twin.nonEmpty)
    // Both sides exact-verify cosine ≥ threshold, so each output is a
    // strict subset of the exact pair set; the hash family only moves
    // LSH recall (measured 0.56 prod / 0.61 twin, mutual jaccard 0.43).
    val truth = pairSet(Dedup.embeddingNearDupPairsExact(embBounded,
      "vec_id", "embedding", 0.3).select(col("id_a"), col("id_b")))
    assert(prod.subsetOf(truth), "production emitted a non-verified pair")
    assert(twin.subsetOf(truth), "twin emitted a non-verified pair")
    val jac = (prod & twin).size.toDouble / (prod | twin).size
    assert(jac >= 0.3, s"embedding-LSH prod/twin drift: jaccard $jac " +
      s"(${prod.size} prod, ${twin.size} twin)")
    assert((prod & truth).size.toDouble / truth.size >= 0.4, "prod recall")
    assert((twin & truth).size.toDouble / truth.size >= 0.4, "twin recall")
  }

  test("e2/e8: sign-LSH top-k stays interchangeable with the portable twin") {
    val k = 5
    val prod = topkSets(Similarity.lshTopK(embBounded, queries,
      "vec_id", "embedding", k, planes = 4, tables = 6))
    val twin = topkSets(Similarity.lshTopKPortable(embBounded, queries,
      "vec_id", "embedding", k, planes = 4, tables = 6))
    val brute = topkSets(Similarity.bruteForceTopK(embBounded, queries,
      "vec_id", "embedding", k))
    val mutual = meanOverlap(prod, twin, k)
    val prodRecall = meanOverlap(prod, brute, k)
    val twinRecall = meanOverlap(twin, brute, k)
    assert(mutual >= 0.5, s"sign-LSH prod/twin overlap $mutual")
    assert(prodRecall >= 0.4, s"sign-LSH prod recall vs brute $prodRecall")
    assert(twinRecall >= 0.4, s"sign-LSH twin recall vs brute $twinRecall")
  }

  test("e9/e10: PQ re-ranked top-k stays interchangeable with the portable twin") {
    val k = 5
    def run(e: DataFrame, vecCol: String, iters: Int) = {
      val cb = Similarity.pqTrain(e, "vec_id", vecCol, m = 8, k = 16,
        iters = iters)
      val codes = Similarity.pqEncode(e, "vec_id", vecCol, cb)
      topkSets(Similarity.pqTopKRerank(codes, cb, e,
        e.filter(col("vec_id") < 10), "vec_id", vecCol, k = k,
        overscan = 4))
    }
    val prod = run(emb, "embedding", iters = 3)
    val quant = emb.select(col("vec_id"), transform(col("embedding"),
      x => floor(x.cast("double") * 1000 + 0.5)).as("qv"))
    val twin = run(quant, "qv", iters = 1)
    val mutual = meanOverlap(prod, twin, k)
    assert(mutual >= 0.4, s"PQ prod/twin top-k overlap $mutual")
  }

  test("e12/e13: IVF-PQ re-ranked top-k stays interchangeable with the portable twin") {
    val k = 5
    def run(e: DataFrame, vecCol: String, iters: Int) = {
      val cents = Similarity.kmeansCentroids(e, "vec_id", vecCol, k = 8,
        iters = iters)
      val withC = e.join(
        Similarity.assignToCentroids(e, "vec_id", vecCol, cents),
        Seq("vec_id"))
      val cb = Similarity.ivfpqTrain(withC, "vec_id", vecCol, "cluster",
        cents, m = 8, k = 16, iters = iters)
      val codes = Similarity.ivfpqEncode(withC, "vec_id", vecCol,
        "cluster", cents, cb)
      topkSets(Similarity.ivfpqTopKRerank(codes, cents, cb, e,
        e.filter(col("vec_id") < 10), "vec_id", vecCol, k = k,
        nprobe = 3, overscan = 4))
    }
    val prod = run(emb, "embedding", iters = 3)
    val quant = emb.select(col("vec_id"), transform(col("embedding"),
      x => floor(x.cast("double") * 1000 + 0.5)).as("qv"))
    val twin = run(quant, "qv", iters = 1)
    val brute = topkSets(Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", k))
    val mutual = meanOverlap(prod, twin, k)
    assert(mutual >= 0.3, s"IVF-PQ prod/twin top-k overlap $mutual")
    assert(meanOverlap(prod, brute, k) >= 0.4,
      s"IVF-PQ prod recall vs brute ${meanOverlap(prod, brute, k)}")
    assert(meanOverlap(twin, brute, k) >= 0.4,
      s"IVF-PQ twin recall vs brute ${meanOverlap(twin, brute, k)}")
  }

  test("d17/d18: semdedup keep decisions stay interchangeable with the portable twin") {
    def run(e: DataFrame, vecCol: String, iters: Int): Map[Long, Boolean] = {
      val cents = Similarity.kmeansCentroids(e, "vec_id", vecCol, k = 8,
        iters = iters)
      val assign = Similarity.assignToCentroids(e, "vec_id", vecCol, cents)
      Dedup.semDedup(e, "vec_id", vecCol, assign, cents, threshold = 0.35)
        .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    }
    val prod = run(emb, "embedding", iters = 3)
    val quant = emb.select(col("vec_id"), transform(col("embedding"),
      x => floor(x.cast("double") * 1000 + 0.5).cast("float")).as("qv"))
    val twin = run(quant, "qv", iters = 1)
    assert(prod.keySet == twin.keySet) // both total over the corpus
    // Both must actually drop something, else agreement is vacuous.
    assert(prod.values.exists(k => !k), "production dropped nothing")
    assert(twin.values.exists(k => !k), "twin dropped nothing")
    // Cluster boundaries move between iters=3 and the twin's iters=1,
    // so pair sets differ at the margin; keep decisions must still
    // agree on the bulk of the corpus.
    val agree = prod.keys.count(k => prod(k) == twin(k)).toDouble / prod.size
    assert(agree >= 0.8, s"semdedup prod/twin keep agreement $agree " +
      s"(${prod.values.count(k => !k)} prod drops, " +
      s"${twin.values.count(k => !k)} twin drops)")
  }

  test("e7/e11: IVF k-means top-k stays interchangeable with the portable twin") {
    val k = 5
    def run(e: DataFrame, vecCol: String, iters: Int) = {
      val assign = Similarity.kmeansAssign(e, "vec_id", vecCol, k = 8,
        iters = iters)
      val withC = e.join(assign, Seq("vec_id"))
      topkSets(Similarity.ivfTopK(withC, e.filter(col("vec_id") < 10),
        "vec_id", vecCol, "cluster", k, nprobe = 3))
    }
    val prod = run(emb, "embedding", iters = 3)
    // e11's quantization, cast back to float (exact: |x·1000| ≪ 2²⁴) —
    // the native cosine Expression is float-typed.
    val quant = emb.select(col("vec_id"), transform(col("embedding"),
      x => floor(x.cast("double") * 1000 + 0.5).cast("float")).as("qv"))
    val twin = run(quant, "qv", iters = 1)
    val brute = topkSets(Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", k))
    val mutual = meanOverlap(prod, twin, k)
    assert(mutual >= 0.3, s"IVF prod/twin top-k overlap $mutual")
    assert(meanOverlap(prod, brute, k) >= 0.4,
      s"IVF prod recall vs brute ${meanOverlap(prod, brute, k)}")
    assert(meanOverlap(twin, brute, k) >= 0.4,
      s"IVF twin recall vs brute ${meanOverlap(twin, brute, k)}")
  }

  test("t8: hashed contamination equals the portable string form") {
    import graft.llm.TextAnalysis
    val all = Tables.documents(spark, Sf)
    def run(hashed: Boolean) = TextAnalysis.contaminationStats(
        all, "doc_id", "text", all.filter(col("doc_id") % 37 === 0),
        "text", n = 5, threshold = 0.2, hashed = hashed)
      .select(col("doc_id"), col("n_ngrams"), col("n_matched"),
        col("contaminated"))
      .as[(Long, Long, Long, Boolean)].collect().toSet
    // Identical COUNTS, not just decisions: a 64-bit xxhash collision
    // inside one document's ≤10³ n-grams (p ≈ 10⁻¹³) is the only
    // mechanism that could separate them.
    assert(run(hashed = true) == run(hashed = false))
  }
}
