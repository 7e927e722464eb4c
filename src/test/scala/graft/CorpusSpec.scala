package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.Corpus

/** Semantics of the corpus-assembly operators: determinism, seed
  * independence, rate accuracy, shard totality. */
class CorpusSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val docs = (0L until 2000L).map(i => (i, s"src${i % 4}"))
    .toDF("doc_id", "source")

  test("hash sample is deterministic and ~rate-accurate") {
    val a = Corpus.hashSample(docs, "doc_id", 10, "s")
      .select("doc_id").as[Long].collect().sorted
    val b = Corpus.hashSample(docs, "doc_id", 10, "s")
      .select("doc_id").as[Long].collect().sorted
    assert(a.toSeq == b.toSeq) // rerun-stable, no rand()
    assert(a.length > 140 && a.length < 260) // ~200 ± sampling noise
    // growing the corpus never evicts previously sampled keys
    val grown = Corpus.hashSample(
      (0L until 4000L).map(i => (i, "s")).toDF("doc_id", "source"),
      "doc_id", 10, "s").select("doc_id").as[Long].collect()
    assert(a.toSet.subsetOf(grown.toSet))
  }

  test("different seeds give independent samples") {
    val a = Corpus.hashSample(docs, "doc_id", 50, "train")
      .select("doc_id").as[Long].collect().toSet
    val b = Corpus.hashSample(docs, "doc_id", 50, "eval")
      .select("doc_id").as[Long].collect().toSet
    val overlap = (a & b).size.toDouble / 2000
    // independent 50% samples overlap ~25% of the corpus
    assert(overlap > 0.15 && overlap < 0.35,
      s"suspicious overlap $overlap")
  }

  test("shard assignment is total, balanced, with contiguous positions") {
    val out = Corpus.shardAssign(docs, "doc_id", 8, "e0")
      .select("doc_id", "shard", "pos")
      .as[(Long, Int, Int)].collect()
    assert(out.length == 2000) // total: every row gets a shard
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet == (0 until 8).toSet)
    byShard.values.foreach { rows =>
      assert(rows.length > 150 && rows.length < 350) // ~250 each
      // positions are exactly 1..n within the shard
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // rerun gives the identical epoch order
    val again = Corpus.shardAssign(docs, "doc_id", 8, "e0")
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("weighted mix: rates per source, absent sources dropped") {
    val out = Corpus.mixByWeights(docs, "doc_id", "source",
      Map("src0" -> 100, "src1" -> 40, "src2" -> 0), "m")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(out("src0") == 500) // 100% keeps everything
    assert(out("src1") > 140 && out("src1") < 260) // ~200
    assert(!out.contains("src2")) // 0% rate
    assert(!out.contains("src3")) // absent from config
  }

  test("budgetMix: shortfall source kept whole, others subsample ~budget, deterministic") {
    // 3 sources x 500 docs x 10 tokens = 5000 tokens each. Weights
    // (0.5, 0.25, 0.05) at budget 8000 give allocations (4000, 2000,
    // 400) => rates (0.8, 0.4, 0.08); srcW (weight 2.0) allocates
    // 16000 > 5000 => rate 1, kept WHOLE. srcX has no weight => drop.
    val d = (0L until 2500L).map(i => (i, Seq("srcA", "srcB", "srcC",
      "srcW", "srcX")((i % 5L).toInt), "t " * 9 + "t"))
      .toDF("doc_id", "source", "text")
    val n = size(graft.functions.Scalars.tokens(col("text")))
    val w = Map("srcA" -> 0.5, "srcB" -> 0.25, "srcC" -> 0.05,
      "srcW" -> 2.0)
    val out = Corpus.budgetMix(d, "doc_id", "source", n, w, 8000L, "bm")
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(out("srcW") == 500L) // shortfall regime: whole source
    assert(!out.contains("srcX")) // unweighted source dropped
    // Subsampled sources land near rate x 500 (hash-uniformity slack),
    // and their kept token mass near the allocation.
    assert(math.abs(out("srcA") - 400L) <= 60)
    assert(math.abs(out("srcB") - 200L) <= 45)
    assert(math.abs(out("srcC") - 40L) <= 25)
    // Deterministic: same seed, same set; stable under re-evaluation.
    val a = Corpus.budgetMix(d, "doc_id", "source", n, w, 8000L, "bm")
      .select("doc_id").as[Long].collect().sorted
    val b = Corpus.budgetMix(d, "doc_id", "source", n, w, 8000L, "bm")
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("sequence packing: contiguous fill, budget boundaries, stability") {
    import org.apache.spark.sql.functions._
    // Single shard so the layout is the full hash order; budget 10.
    val df = Seq((1L, 4), (2L, 3), (3L, 6), (4L, 5), (5L, 2))
      .toDF("id", "ntok")
    val out = Corpus.packSequences(df, "id", col("ntok"),
        numShards = 1, budgetTokens = 10, seed = "t")
      .orderBy("seq_idx", "tok_offset")
      .select("id", "seq_idx", "tok_offset")
      .as[(Long, Int, Int)].collect().toSeq
    // Offsets are the running sum of preceding docs (mod 10) in hash
    // order; seq boundaries at every 10 tokens of the concat stream.
    val totalToks = 4 + 3 + 6 + 5 + 2
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out.head._2 == 0 && out.head._3 == 0) // stream starts at 0,0
    assert(out.last._2 <= totalToks / 10) // no doc starts past the stream end
    // Deterministic: identical on rerun.
    val again = Corpus.packSequences(df, "id", col("ntok"),
        1, 10, "t").orderBy("seq_idx", "tok_offset")
      .select("id", "seq_idx", "tok_offset")
      .as[(Long, Int, Int)].collect().toSeq
    assert(out == again)
    // Cross-check the invariant directly: offset/seq of each doc equal
    // the cumulative tokens before it in layout order.
    val ntok = Map(1L -> 4, 2L -> 3, 3L -> 6, 4L -> 5, 5L -> 2)
    var cum = 0
    out.sortBy(r => (r._2.toLong * 10) + r._3).foreach { case (id, sq, off) =>
      assert(sq == cum / 10 && off == cum % 10, s"doc $id")
      cum += ntok(id)
    }
  }

  test("sampling/mixing plans are pure scan filters (no shuffle)") {
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    assert(!plan(Corpus.hashSample(docs, "doc_id", 10, "s"))
      .contains("Exchange"))
    assert(!plan(Corpus.mixByWeights(docs, "doc_id", "source",
      Map("src0" -> 50), "m")).contains("Exchange"))
  }

  test("stratified quota: exact cap per stratum, deterministic, seed-sensitive") {
    val out = Corpus.stratifiedQuota(docs, "doc_id", "source", 25, "cap")
    val perStratum = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(perStratum.values.toSet == Set(25L))
    assert(perStratum.keySet == Set("src0", "src1", "src2", "src3"))
    // Deterministic: same seed → identical membership.
    val again = Corpus.stratifiedQuota(docs, "doc_id", "source", 25, "cap")
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
    // Different seed → (overwhelmingly) different membership.
    val other = Corpus.stratifiedQuota(docs, "doc_id", "source", 25, "other")
      .select("doc_id").as[Long].collect().toSet
    assert(again != other)
    // Quota above the stratum size keeps everything.
    assert(Corpus.stratifiedQuota(docs, "doc_id", "source", 1000, "cap")
      .count() == 2000)
  }

  test("chunking: coverage, overlap, short docs one chunk, empty docs none") {
    val rows = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than size
      (3L, ""),                                       // empty string
      (4L, null.asInstanceOf[String]))                // null text
      .toDF("doc_id", "text")
    val out = Corpus.chunk(rows, "doc_id", "text", size = 4, overlap = 2)
      .as[(Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // stride 2: ceil((10-2)/2) = 4 chunks, each 4 tokens, 2 shared.
    assert(out(1L) == Seq("w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8",
      "w7 w8 w9 w10"))
    assert(out(2L) == Seq("a b c")) // short doc: one (ragged) chunk
    // "" tokenizes to [""], one 1-token chunk — same as the oracle's
    // string_split; null text yields NO chunks (no phantom null row).
    assert(out(3L) == Seq(""))
    assert(!out.contains(4L))
    // every token of doc 1 appears in at least one chunk
    val covered = out(1L).flatMap(_.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"w$i").toSet)
  }

  test("contamination: benchmark members 1.0, disjoint docs 0.0, partial in between") {
    import graft.llm.TextAnalysis
    val corpus = Seq(
      (1L, "a b c d e f"),        // shares 2 of its 2 distinct 5-grams
      (2L, "a b c d e zz"),       // shares 1 of 2
      (3L, "p q r s t u"),        // disjoint
      (4L, "x y"),                // too short: no 5-grams
      (5L, "a b c d e f")         // exact dup of a benchmark doc
    ).toDF("id", "text")
    val bench = Seq((1L, "a b c d e f")).toDF("id", "text")
    val out = TextAnalysis.contaminationStats(corpus, "id", "text",
        bench, "text", n = 5, threshold = 0.5)
      .select("id", "n_ngrams", "n_matched", "contamination", "contaminated")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((2L, 2L, 1.0, true)))
    assert(out(2L) == ((2L, 1L, 0.5, true)))
    assert(out(3L) == ((2L, 0L, 0.0, false)))
    assert(out(4L) == ((0L, 0L, 0.0, false)))
    assert(out(5L) == ((2L, 2L, 1.0, true)))
  }

  test("FFD bin packing: capacity respected, oversize isolated, deterministic") {
    // Token counts engineered so first-fit must backtrack to earlier
    // bins: 300 (oversize), 200, 180, 100, 90, 60, 50, 20 on budget 256.
    val d = Seq((1L, 300L), (2L, 200L), (3L, 180L), (4L, 100L),
      (5L, 90L), (6L, 60L), (7L, 50L), (8L, 20L)).toDF("doc_id", "ntok")
    val out = Corpus.packBinsFFD(d, "doc_id", col("ntok"),
        numShards = 1, budgetTokens = 256, seed = "t")
      .select("doc_id", "bin_idx", "bin_offset")
      .as[(Long, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val ntok = Map(1L -> 300L, 2L -> 200L, 3L -> 180L, 4L -> 100L,
      5L -> 90L, 6L -> 60L, 7L -> 50L, 8L -> 20L)
    // FFD on 256: [300] | [200, 50] | [180, 60] | [100, 90, 20]
    assert(out(1L) == ((0, 0L)))   // oversize opens its own bin
    assert(out(2L) == ((1, 0L)))
    assert(out(3L) == ((2, 0L)))
    assert(out(4L) == ((3, 0L)))
    assert(out(5L) == ((3, 100L)))
    assert(out(6L) == ((2, 180L))) // first fit backtracks to bin 2
    assert(out(7L) == ((1, 200L))) // ... and to bin 1
    assert(out(8L) == ((3, 190L)))
    // every non-oversize bin within budget; offsets consistent
    val loads = out.toSeq.groupBy(_._2._1)
      .map { case (b, rs) => b -> rs.map(r => ntok(r._1)).sum }
    loads.foreach { case (b, load) =>
      assert(load <= 256 || ntok(out.find(_._2._1 == b).get._1) > 256) }
    val rerun = Corpus.packBinsFFD(d, "doc_id", col("ntok"),
        numShards = 1, budgetTokens = 256, seed = "t")
      .select("doc_id", "bin_idx", "bin_offset")
      .as[(Long, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rerun == out)
  }

  test("FFD packs at least as tightly as concat-and-chunk's doc-split bound") {
    // vs c4 (packSequences): concat-and-chunk achieves the information-
    // theoretic floor ceil(total/budget) per shard by SPLITTING docs
    // across boundaries; FFD keeps docs whole, so it can't beat the
    // floor, and its guarantee caps the overhead at 11/9·OPT + 1.
    val docs = (0L until 400L).map(i => (i, 20L + (i * 37) % 230))
      .toDF("doc_id", "ntok")
    val budget = 256
    val packed = Corpus.packBinsFFD(docs, "doc_id", col("ntok"),
        numShards = 4, budgetTokens = budget, seed = "eff")
      .groupBy("shard").agg(max("bin_idx").as("maxBin"))
      .as[(Int, Int)].collect().toMap
    val totals = Corpus.shardAssign(docs, "doc_id", 4, "eff")
      .groupBy("shard").agg(sum("ntok").as("tot"))
      .as[(Int, Long)].collect().toMap
    (0 until 4).foreach { sh =>
      val nBins = packed(sh) + 1
      val floor = math.ceil(totals(sh).toDouble / budget).toInt
      assert(nBins >= floor, s"shard $sh: $nBins bins below floor $floor")
      assert(nBins <= math.ceil(11.0 * floor / 9).toInt + 1,
        s"shard $sh: $nBins bins vs FFD bound on floor $floor")
    }
  }

  test("DSIR weights rank target-like docs above anti-target docs") {
    // Two disjoint vocabularies: target-language docs repeat "good"
    // bigrams, the rest repeat "bad" ones; mixed docs sit between.
    val mk = (w: String) => Seq.fill(30)(w).mkString(" ")
    val d = ((0L until 20L).map(i => (i, "en", mk(s"alpha beta")))
      ++ (20L until 40L).map(i => (i, "de", mk(s"gamma delta")))
      ++ (40L until 50L).map(i =>
        (i, "de", mk("alpha beta") + " " + mk("gamma delta"))))
      .toDF("doc_id", "lang", "text")
    val out = Corpus.dsirWeights(d, "doc_id", "text",
        col("lang") === "en", buckets = 256, topN = 25)
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == 50) // every doc scored
    val byId = out.map(r => r._1 -> r._2).toMap
    val target = (0L until 20L).map(byId)
    val anti = (20L until 40L).map(byId)
    val mixed = (40L until 50L).map(byId)
    assert(target.min > mixed.max,
      s"target ${target.min} should outrank mixed ${mixed.max}")
    assert(mixed.min > anti.max,
      s"mixed ${mixed.min} should outrank anti ${anti.max}")
    // top-25 = the 20 target docs + 5 mixed ones, deterministically
    val selected = out.filter(_._3).map(_._1).toSet
    assert(selected.size == 25)
    assert((0L until 20L).toSet.subsetOf(selected))
    assert(selected.forall(_ < 50L) && (20L until 40L).forall(!selected(_)))
    // rerun-stable (no rand() anywhere)
    val again = Corpus.dsirWeights(d, "doc_id", "text",
        col("lang") === "en", buckets = 256, topN = 25)
      .as[(Long, Long, Boolean)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("DSIR weight of a doc with no bigrams is zero and never selected over scored docs") {
    val d = Seq((0L, "en", "alpha beta alpha beta"),
      (1L, "de", "gamma delta gamma delta"), (2L, "de", "solo"))
      .toDF("doc_id", "lang", "text")
    val out = Corpus.dsirWeights(d, "doc_id", "text",
        col("lang") === "en", buckets = 64, topN = 1)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out(2L)._1 == 0L && !out(2L)._2) // bigram-less doc: weight 0
    assert(out(1L)._1 < 0L && !out(1L)._2) // anti-target: negative
    assert(out(0L)._1 > 0L && out(0L)._2) // target-like: positive, top-1
  }

  test("linear classifier score is the exact integer dot product, total over docs") {
    import graft.llm.TextAnalysis
    val d = Seq((0L, "apple apple banana"), (1L, "banana"), (2L, "cherry"))
      .toDF("doc_id", "text")
    // Feature ids computed exactly as the operator computes them.
    def f(tok: String): Long = spark.range(1).select(
      pmod(conv(substring(md5(lit(tok)), 1, 8), 16, 10).cast("long"),
        lit(1024L))).as[Long].head()
    val (fa, fb, fc) = (f("apple"), f("banana"), f("cherry"))
    assert(Set(fa, fb, fc).size == 3) // no md5 bucket collisions here
    val wts = Seq((fa, 5L), (fb, -2L), (fc, 0L)).toDF("feature", "w")
    val out = TextAnalysis.linearClassifierScore(d, "doc_id", "text",
        wts, buckets = 1024)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out(0L) == ((2 * 5 - 2, true))) // 2·w(apple) + 1·w(banana)
    assert(out(1L) == ((-2L, false)))
    assert(out(2L) == ((0L, false))) // scored but not positive
    // a model that omits a doc's every feature still scores the doc (0)
    val partial = TextAnalysis.linearClassifierScore(d, "doc_id", "text",
        Seq((fa, 1L)).toDF("feature", "w"), buckets = 1024)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    assert(partial == Map(0L -> 2L, 1L -> 0L, 2L -> 0L))
  }

  test("perceptron trainer: iteration 1 is the class-difference sum; " +
    "trained model separates a separable corpus") {
    import graft.llm.TextAnalysis
    val d = Seq(
      (0L, "good fine good", 1L), (1L, "good solid", 1L),
      (2L, "bad awful", -1L), (3L, "bad bad poor", -1L))
      .toDF("doc_id", "text", "y")
    def f(tok: String): Long = spark.range(1).select(
      pmod(conv(substring(md5(lit(tok)), 1, 8), 16, 10).cast("long"),
        lit(1024L))).as[Long].head()
    // One iteration from w=0: every doc is misclassified (y·0 <= 0),
    // so w[f] = Σ_docs y·count_f exactly.
    val w1 = TextAnalysis.perceptronTrain(d, "doc_id", "text", col("y"),
        iters = 1, buckets = 1024)
      .as[(Long, Long)].collect().toMap
    assert(w1.size == 1024)
    assert(w1(f("good")) == 3L)  // 2 + 1, both y=+1
    assert(w1(f("bad")) == -3L)  // 1 + 2, both y=-1
    assert(w1(f("fine")) == 1L && w1(f("awful")) == -1L)
    assert(w1.values.sum == (3 + 2) - (2 + 3)) // total token mass × y
    // Trained for 3 iterations, the model must classify its own
    // (separable) training set perfectly through the serving path.
    val w3 = TextAnalysis.perceptronTrain(d, "doc_id", "text", col("y"),
      iters = 3, buckets = 1024)
    val scored = TextAnalysis.linearClassifierScore(d, "doc_id", "text",
        w3, buckets = 1024)
      .select(col("doc_id"), col("positive")).as[(Long, Boolean)]
      .collect().toMap
    assert(scored == Map(0L -> true, 1L -> true, 2L -> false, 3L -> false))
  }

  test("BPE training replays the textbook merge sequence on a hand corpus") {
    import graft.llm.TextAnalysis
    // words: aa ×2 -> [a,a,</w>], ab ×1 -> [a,b,</w>].
    // Round 1 pairs: (a,a):2, (a,</w>):2, (a,b):1, (b,</w>):1 — tie on
    // 2 broken by (l, r) ascending: "</w>" < "a", so (a,</w>) merges.
    // Round 2: (a,a</w>):2 wins. Round 3: (a,b):1 beats (b,</w>):1.
    val d = Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(d, "doc_id", "text", merges = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "a", "</w>", "a</w>", 2L),
      (2, "a", "a</w>", "aa</w>", 2L),
      (3, "a", "b", "ab", 1L)))
    // The min-frequency floor drops "ab" (count 1): round 3's pair
    // supply is exhausted after the two aa merges.
    val floored = TextAnalysis.bpeTrain(d, "doc_id", "text",
        merges = 3, minCount = 2L)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(floored == Seq(
      (1, "a", "</w>", "a</w>", 2L),
      (2, "a", "a</w>", "aa</w>", 2L)))
  }

  test("BPE token counts serve from the trained segmentation, char fallback outside vocab") {
    import graft.llm.TextAnalysis
    // Unfloored, "abc" trains too, so round 3 merges (a,b) at count 2:
    // aa -> [aa</w>] (1), ab -> [ab,</w>] (2), abc -> [ab,c,</w>] (3).
    // Doc 4 is empty -> 0.
    val d = Seq((1L, "aa ab"), (2L, "aa"), (3L, "abc"), (4L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeTokenCounts(d, "doc_id", "text", merges = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 3L, 4L -> 0L))
    // With the floor at 2, ab and abc (count 1) are out of vocab:
    // ab falls back to 3 (a, b, marker), abc still 4.
    val floored = TextAnalysis.bpeTokenCounts(d, "doc_id", "text",
        merges = 3, minCount = 2L)
      .as[(Long, Long)].collect().toMap
    assert(floored(1L) == 1L + 3L && floored(3L) == 4L)
  }

  test("BPE greedy rewrite is non-overlapping left-to-right on repeated symbols") {
    import graft.llm.TextAnalysis
    // "aaaa" -> [a,a,a,a,</w>]: (a,a) counts 3 (all adjacent slots);
    // the greedy fold rewrites to [aa,aa,</w>] — merging 1&2 then 3&4,
    // never the overlapping middle pair. Round 2: (aa,aa):1 vs
    // (aa,</w>):1 tie -> r ascending picks (aa,</w>).
    val d = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(d, "doc_id", "text", merges = 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "a", "a", "aa", 3L),
      (2, "aa", "</w>", "aa</w>", 1L)))
    // Merge supply exhausts cleanly: asking for more rounds than the
    // corpus supports returns the full sequence, no failure.
    val all = TextAnalysis.bpeTrain(d, "doc_id", "text", merges = 10)
    assert(all.count() >= 3 && all.count() <= 4)
  }

  test("BPE local merge loop is bit-identical to the distributed round twin, including UTF-8 tie-breaks") {
    import graft.llm.TextAnalysis
    // A corpus engineered for hostile tie-breaks: repeated-symbol runs
    // (greedy fold overlap cases), count ties resolved only by symbol
    // order, and a U+FFFD vs U+1F600 tie — UTF-16 code units order the
    // surrogate-pair emoji FIRST (0xD83D < 0xFFFD) while UTF-8 bytes
    // order U+FFFD first (0xEF < 0xF0); a trainer comparing Java
    // strings diverges from the Spark/DuckDB collation exactly here.
    val d = Seq(
      (1L, "aa ab aaaa banana bananas"),
      (2L, "aa xy�q xy😀q"),
      (3L, "mississippi mississippi miss issi"),
      (4L, "")).toDF("doc_id", "text")
    for (m <- Seq(1, 3, 8, 20); floor <- Seq(1L, 2L)) {
      val (lm, lw) = TextAnalysis.bpeTrainFull(d, "doc_id", "text",
        merges = m, minCount = floor)
      val (rm, rw) = TextAnalysis.bpeTrainRounds(d, "doc_id", "text",
        merges = m, minCount = floor)
      assert(lm.as[(Int, String, String, String, Long)].collect().toSeq ==
        rm.as[(Int, String, String, String, Long)].collect().toSeq,
        s"merge tables diverge at merges=$m minCount=$floor")
      assert(lw.as[(String, Long, Seq[String])].collect().toSet ==
        rw.as[(String, Long, Seq[String])].collect().toSet,
        s"segmentations diverge at merges=$m minCount=$floor")
    }
    // Deterministic pin of the collation itself: after (a,</w>) wins
    // round 1, round 2 ties (�, a</w>):2 against (😀, a</w>):2 — the
    // UTF-8 argmax picks U+FFFD (EF BF BD < F0 9F 98 80); a UTF-16
    // comparison would pick the emoji.
    val tie = Seq((1L, "�a �a 😀a 😀a")).toDF("doc_id", "text")
    val seq2 = TextAnalysis.bpeTrain(tie, "doc_id", "text", merges = 2)
      .as[(Int, String, String, String, Long)].collect()
    assert(seq2(1) == ((2, "�", "a</w>", "�a</w>", 2L)), seq2.toSeq)
  }

  test("BPE trains a production-scale vocabulary (1000+ merges) driver-local") {
    import graft.llm.TextAnalysis
    // 400 distinct 10+-char words supply >1000 merge capacity; the
    // previous 64-round cap made this size unreachable.
    val words = (0 until 400).map(i =>
      f"w$i%03d${"abcdefghij".drop(i % 7)}${(i * 31) % 100}%02d")
    val d = words.zipWithIndex
      .map { case (w, i) => (i.toLong, (w + " ") * (1 + i % 3)) }
      .toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(d, "doc_id", "text", merges = 1200)
      .as[(Int, String, String, String, Long)].collect()
    assert(m.length >= 1000, s"only ${m.length} merges trained")
    assert(m.map(_._1).toSeq == (1 to m.length), "ranks not contiguous")
    assert(m.forall(_._5 >= 1L), "non-positive pair count")
    // Every merge's parts are producible: a left/right symbol is a
    // single code point, the marker, or an earlier round's merged.
    val known = scala.collection.mutable.Set[String]("</w>")
    m.foreach { case (_, l, r, lr, _) =>
      for (s <- Seq(l, r))
        assert(s.codePointCount(0, s.length) == 1 || known.contains(s),
          s"symbol $s not derivable at its round")
      known += lr
    }
  }

  test("TokenizerStore: serve from the store equals direct train+serve; drift refused loudly") {
    import graft.llm.{TextAnalysis, TokenizerStore}
    val d = Seq((1L, "aa ab"), (2L, "aa"), (3L, "abc"), (4L, ""))
      .toDF("doc_id", "text")
    val dir = "file:" +
      java.nio.file.Files.createTempDirectory("graft-tok").toString
    try {
      val p = TokenizerStore.Params(merges = 3, minCount = 1L)
      TokenizerStore.build(d, "doc_id", "text", dir, p)
      // Round-trip invisible: counts from the store == the ephemeral
      // train+serve composition.
      val direct = TextAnalysis.bpeTokenCounts(d, "doc_id", "text",
        merges = 3).as[(Long, Long)].collect().toMap
      val served = TokenizerStore.tokenCounts(spark, dir, p,
        d, "doc_id", "text").as[(Long, Long)].collect().toMap
      assert(served == direct && served.nonEmpty)
      // Parameter drift refuses loudly.
      for (bad <- Seq(p.copy(merges = 4), p.copy(minCount = 2L))) {
        val e = intercept[IllegalStateException] {
          TokenizerStore.read(spark, dir, bad)
        }
        assert(e.getMessage.contains("mismatch"), e.getMessage)
      }
      // Retrain-and-swap over the live store: new params, new model,
      // old model unreadable under old params, new one serves.
      val p2 = TokenizerStore.Params(merges = 2, minCount = 1L)
      TokenizerStore.build(d, "doc_id", "text", dir, p2)
      intercept[IllegalStateException] { TokenizerStore.read(spark, dir, p) }
      val served2 = TokenizerStore.tokenCounts(spark, dir, p2,
        d, "doc_id", "text").as[(Long, Long)].collect().toMap
      val direct2 = TextAnalysis.bpeTokenCounts(d, "doc_id", "text",
        merges = 2).as[(Long, Long)].collect().toMap
      assert(served2 == direct2)
      // Franken-model: segments spliced in from a different training
      // run (merges they reference are absent) — read must refuse.
      val (m3, _) = TextAnalysis.bpeTrainFull(
        Seq((9L, "zz zy zz")).toDF("doc_id", "text"),
        "doc_id", "text", 2, 1L)
      val (_, w3) = TextAnalysis.bpeTrainFull(d, "doc_id", "text", 3, 1L)
      TokenizerStore.write(m3, w3, dir, p2)
      val e2 = intercept[IllegalArgumentException] {
        TokenizerStore.read(spark, dir, p2)
      }
      assert(e2.getMessage.contains("training runs"), e2.getMessage)
    } finally graft.queries.Fixtures.deleteRecursively(
      java.nio.file.Paths.get(dir.stripPrefix("file:")))
  }

  test("LM score: exact add-one bigram log-likelihood on a hand model") {
    // Reference doc "a b a b a c": c2 = {ab:2, ba:2, ac:1},
    // c1 = {a:3, b:2}, V = |{a,b,c}| = 3.
    val d = Seq(
      (0L, "ref", "a b a b a c"),
      (1L, "raw", "a b"),   // seen bigram: ln((2+1)/(3+3)) = ln(0.5)
      (2L, "raw", "c a"),   // unseen, unseen context: ln(1/(0+3))
      (3L, "raw", "solo"),  // no bigrams
      (4L, "raw", "a b a b")) // 3 bigrams: ab, ba, ab
      .toDF("doc_id", "source", "text")
    val out = Corpus.lmScore(d, "doc_id", "text", col("source") === "ref")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out.size == 5) // total over docs, including the ref doc
    val lnHalf = math.floor(math.log(0.5) * 1e6 + 0.5).toLong // -693147
    val lnThird = math.floor(math.log(1.0 / 3) * 1e6 + 0.5).toLong
    val lnBa = math.floor(math.log(3.0 / 5) * 1e6 + 0.5).toLong // (2+1)/(2+3)
    assert(out(1L) == ((1L, lnHalf)))
    assert(out(2L) == ((1L, lnThird)))
    assert(out(3L) == ((0L, 0L))) // bigram-less: (0, 0), still a row
    assert(out(4L) == ((3L, 2 * lnHalf + lnBa)))
    // Rerun-stable: the only float step is quantized per feature.
    val again = Corpus.lmScore(d, "doc_id", "text", col("source") === "ref")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(again == out)
  }

  test("LM score with langCol trains one isolated model per language") {
    // lang1 ref has "x y" twice, lang2 ref once — the SAME scored text
    // must get different likelihoods, proving no cross-lang leakage.
    val d = Seq(
      (0L, "l1", "ref", "x y x y"), // c2(xy)=2, c1(x)=2, V=2
      (1L, "l2", "ref", "x y"),     // c2(xy)=1, c1(x)=1, V=2
      (2L, "l1", "raw", "x y"),     // ln((2+1)/(2+2))
      (3L, "l2", "raw", "x y"))     // ln((1+1)/(1+2))
      .toDF("doc_id", "lang", "source", "text")
    val out = Corpus.lmScore(d, "doc_id", "text",
        col("source") === "ref", langCol = Some("lang"))
      .select("doc_id", "lang", "n_bigrams", "lp_sum_e6")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(2L) == (("l1", 1L,
      math.floor(math.log(3.0 / 4) * 1e6 + 0.5).toLong)))
    assert(out(3L) == (("l2", 1L,
      math.floor(math.log(2.0 / 3) * 1e6 + 0.5).toLong)))
  }

  test("hashed LM score equals the portable string-keyed form") {
    // Hashed keys change the join representation, never the counts —
    // scores must match the string form exactly (collisions aside,
    // impossible on this vocabulary).
    val d = Tables.documents(spark, TestSpark.Sf).limit(200)
    for (lc <- Seq(None, Some("lang"))) {
      val a = Corpus.lmScore(d, "doc_id", "text",
          col("source") === "src0", langCol = lc)
        .collect().map(_.toSeq).sortBy(_.head.toString)
      val b = Corpus.lmScore(d, "doc_id", "text",
          col("source") === "src0", langCol = lc, hashed = true)
        .collect().map(_.toSeq).sortBy(_.head.toString)
      assert(a.toSeq == b.toSeq, s"langCol=$lc")
    }
  }

  test("ccnet buckets split each language at the p30/p70 histogram cutoffs") {
    // Ten scored docs per lang with avg NLL 1..10 (n=1, lp=-q/1000 in
    // the 1e6 grid makes avg_nll_e9 = q*1000... use n=1000, s=-q so the
    // div lands exactly on q). Plus one bigram-less doc -> tail.
    val rows = (for (l <- Seq("en", "de"); q <- 1L to 10L)
      yield (l.hashCode.toLong * 100 + q, l, 1000L, -q * 1000L)) :+
      ((999L, "en", 0L, 0L))
    val scored = rows.toDF("doc_id", "lang", "n_bigrams", "lp_sum_e6")
    val out = Corpus.ccnetBuckets(scored, "doc_id", "lang")
      .as[(Long, String, Long, String)].collect()
    assert(out.length == 21)
    val byKey = out.map(r => (r._2, r._4) -> 1).groupBy(_._1)
      .map { case (k, v) => k -> v.size }
    // cum>=3 at q=3, cum>=7 at q=7: head {1,2,3}, middle {4..7},
    // tail {8,9,10} in BOTH languages independently.
    assert(byKey(("en", "head")) == 3 && byKey(("de", "head")) == 3)
    assert(byKey(("en", "middle")) == 4 && byKey(("de", "middle")) == 4)
    assert(byKey(("en", "tail")) == 4) // 3 scored + the n=0 doc
    assert(byKey(("de", "tail")) == 3)
    val empty = out.find(_._1 == 999L).get
    assert(empty._3 == -1L && empty._4 == "tail")
  }

  test("packSequencesAppend refuses a watermark computed under a drifted budget or shard scheme") {
    import spark.implicits._
    val docs = Seq((1L, 100L), (2L, 200L)).toDF("doc_id", "n")
    val packed = Corpus.packSequences(docs, "doc_id", col("n"),
      numShards = 4, budgetTokens = 256, seed = "p")
    val wm = Corpus.packWatermark(packed, col("n"), budgetTokens = 256)
    // Stamped budget must match the append's: a drifted budget shifts
    // every sealed boundary and overlaps standing sequences.
    val e = intercept[IllegalArgumentException] {
      Corpus.packSequencesAppend(docs, "doc_id", col("n"),
        numShards = 4, budgetTokens = 512, seed = "p", wm)
    }
    assert(e.getMessage.contains("budget"), e.getMessage)
    // A watermark shard outside the append's shard scheme: wrong
    // corpus or wrong config — refuse.
    val wmBig = Seq((7, 1000L)).toDF("shard", "n_tokens")
    val e2 = intercept[IllegalArgumentException] {
      Corpus.packSequencesAppend(docs, "doc_id", col("n"),
        numShards = 4, budgetTokens = 256, seed = "p", wmBig)
    }
    assert(e2.getMessage.contains("shard"), e2.getMessage)
    // The matching case still packs (and a stampless legacy watermark
    // is accepted as asserted-by-caller).
    assert(Corpus.packSequencesAppend(docs, "doc_id", col("n"),
      numShards = 4, budgetTokens = 256, seed = "p", wm).count() == 2)
  }

  test("packSequencesAppend budget guard casts, not getInt: long-typed budgets match, null budgets refuse loudly") {
    import spark.implicits._
    val docs = Seq((1L, 100L), (2L, 200L)).toDF("doc_id", "n")
    // A hand-built watermark carrying budget_tokens as LONG (e.g. from
    // a union or an external read) must match, not throw an opaque
    // ClassCastException.
    val wmLong = Seq((0, 300L, 256L), (1, 100L, 256L))
      .toDF("shard", "n_tokens", "budget_tokens")
    assert(Corpus.packSequencesAppend(docs, "doc_id", col("n"),
      numShards = 4, budgetTokens = 256, seed = "p", wmLong).count() == 2)
    // A NULL budget refuses with the intended message, not an NPE.
    val wmNull = Seq((0, 300L, Some(256L)), (1, 100L, None))
      .toDF("shard", "n_tokens", "budget_tokens")
    val e = intercept[IllegalArgumentException] {
      Corpus.packSequencesAppend(docs, "doc_id", col("n"),
        numShards = 4, budgetTokens = 256, seed = "p", wmNull)
    }
    assert(e.getMessage.contains("null"), e.getMessage)
  }
}
