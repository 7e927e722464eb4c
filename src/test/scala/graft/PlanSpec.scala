package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** Plan-shape guards — the 100 TB design assertions from VERDICT.md:
  * mapping-table joins must broadcast, window dedup must not global
  * sort, filters/projections must reach the parquet scan, and the
  * LSH/ANN paths must never plan a cartesian product. */
class PlanSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private def plan(name: String): String = {
    val q = SparkEntry.registry.find(_.name == name).get
    q.fn(spark, Sf).queryExecution.executedPlan.toString
  }

  test("J1 dimension lookups are broadcast joins") {
    val p = plan("j1_broadcast_lookup")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"))
  }

  test("J4 whitelist/blacklist flags are broadcast joins") {
    val p = plan("j4_oa_flag")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("P5/P6 semi and anti joins broadcast the id list") {
    assert(plan("p5_whitelist_semi").contains("BroadcastHashJoin"))
    assert(plan("p6_blacklist_anti").contains("BroadcastHashJoin"))
  }

  test("W3 latest-per-key is window rank, not a global sort") {
    val p = plan("w3_snapshot_latest_per_customer")
    assert(p.contains("Window"))
    // The only Sort allowed is the partition-local one under the
    // window (global sort would show an Exchange rangepartitioning).
    assert(!p.contains("rangepartitioning"), p.take(1500))
  }

  test("P3 narrow extract pushes filter and prunes columns at the scan") {
    val p = plan("p3_local_extract")
    assert(p.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,200)]"),
      p.take(1500))
    assert(p.contains("ReadSchema") && !p.contains("text"), p.take(1500))
  }

  test("LSH dedup and ANN never plan a cartesian product") {
    assert(!plan("d3_minhash_lsh_pairs").contains("CartesianProduct"))
    assert(!plan("e2_ann_lsh_topk").contains("CartesianProduct"))
  }

  test("license tagging holdings joins are broadcast") {
    val p = plan("l1_license_tag")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("every registered query has a distinct name and compiles a plan") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    // Oracle coverage: the rows-only set stays the known hash-family
    // exceptions. Every dedup/ANN member is double-gated: its portable
    // twin is oracle-checked (d9/d14/d5/d13/e8/e10/e11), and
    // TwinConsistencySpec pins the PRODUCTION path's output to that
    // twin's, so a production-only edit can't drift behind this list:
    //   d3_minhash_lsh_pairs   → twin d9,  TwinConsistencySpec "d3/d9"
    //   d11_minhash_oph_pairs  → twin d14, TwinConsistencySpec "d11/d14"
    //   d4_simhash             → twin d5,  TwinConsistencySpec "d4/d5"
    //   d7_embedding_neardup_lsh → twin d13, TwinConsistencySpec "d7/d13"
    //   e2_ann_lsh_topk        → twin e8,  TwinConsistencySpec "e2/e8"
    //   e4_ann_ivf_topk        → twin e11, DedupSpec IVF recall spec
    //   e7_ann_ivf_kmeans      → twin e11, TwinConsistencySpec "e7/e11"
    //   e9_ann_pq              → twin e10, TwinConsistencySpec "e9/e10"
    //   e12_ann_ivfpq          → twin e13, TwinConsistencySpec "e12/e13"
    //   d17_semdedup           → twin d18, TwinConsistencySpec "d17/d18"
    //   f13_provenance         → value env-dependent by nature (rows-only)
    //   g9_distinct_approx     → approx sketch; rows+error spec (GraphSpec)
    //   a8_quantiles_approx    → approx sketch; rows+rank-error spec (OpsSpec)
    val rowsOnly = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(rowsOnly == Set("f13_provenance", "d3_minhash_lsh_pairs",
      "d11_minhash_oph_pairs", "d4_simhash", "e2_ann_lsh_topk",
      "e4_ann_ivf_topk", "e7_ann_ivf_kmeans", "e9_ann_pq",
      "e12_ann_ivfpq", "d7_embedding_neardup_lsh", "d17_semdedup",
      "g9_distinct_approx", "a8_quantiles_approx"))
  }

  test("GraftExtensions exposes the whole native-function surface to plain SQL") {
    import graft.plans.GraftExtensions
    val names = GraftExtensions.All.map(_._1.funcName)
    assert(names.distinct.size == names.size, "duplicate function names")
    // Every native expression family must appear — a new expression
    // that forgets the extension list fails here, not in a deployment.
    for (want <- Seq("cosine_sim", "lsh_buckets", "l2_sq",
        "nearest_centroid", "nearest_centroid_2l", "pq_codes",
        "minhash_sig_arr", "minhash_bands", "minhash_oph_sig",
        "tokens_distinct", "tokens_distinct_hashed", "simhash_fp",
        "array_intersect_size", "funnel_gates", "ngram_hashes",
        "image_mean_pool", "image_dims", "png_synth", "jpeg_synth",
        "audio_mean_pool", "audio_stats", "video_meta", "video_frame_pool",
        "avi_synth", "mov_synth", "wav_synth"))
      assert(names.contains(want), s"missing from GraftExtensions: $want")
    // The engine's own sessions now load the surface via
    // spark.sql.extensions (Tables.localSession) — assert the shared
    // test session really is on that ONE path, then drive a
    // cross-family sample through plain spark.sql WITHOUT any manual
    // registration: resolution below proves the injected builders work.
    assert(spark.conf.get("spark.sql.extensions")
      .contains("graft.plans.GraftExtensions"),
      "test session must register functions via the deployment path")
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
        |       simhash_fp('a b a', 16, true) AS fp,
        |       size(minhash_sig_arr(array('x', 'y'), 8, false)) AS sig,
        |       array_intersect_size(array('a', 'b'), array('b', 'c')) AS ix,
        |       size(ngram_hashes('a b c d', 2)) AS ng,
        |       size(image_mean_pool(png_synth(CAST(7 AS BIGINT), 4, 4), 2)) AS img,
        |       image_dims(png_synth(CAST(7 AS BIGINT), 5, 3)).width AS iw,
        |       audio_mean_pool(CAST(NULL AS BINARY), 4) IS NULL AS anull,
        |       video_meta(CAST('junk' AS BINARY)) IS NULL AS vnull
        |""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getInt(2) == 8 && r.getInt(3) == 1 && r.getInt(4) == 3)
    assert(r.getInt(5) == 12 && r.getInt(6) == 5)
    assert(r.getBoolean(7) && r.getBoolean(8))
  }

  test("no registered query plans a cartesian product, sort-merge join, or UDF") {
    // Nested-loop joins are allowed ONLY in the bounded exact baselines
    // (broadcast theta-joins over id-filtered subsets / tiny query sets)
    // and in e6's ONE-ROW broadcast cross join (the standard global-
    // aggregate attachment: the quantization scale array is a single
    // broadcast row, so the "nested loop" is a constant-time lookup per
    // record); everything else must be hash-keyed or broadcast-equi.
    // e7's nested loop is the k-means centroid attach: a broadcast of
    // k (≤8 here) centroid rows against every vector — same
    // constant-rows-per-record shape as e4/e6; e11 is e7's portable
    // twin, so it inherits the same shape.
    // c8's nested loop is the temperatureMix ONE-ROW global-weight-sum
    // attach (the e6 shape): a single broadcast row per stratum-count
    // table, constant work per record.
    // e12/e13's nested loops are the same coarse-centroid attach and
    // the queries × centroids probe selection (≤ 8 broadcast rows);
    // e14 is e13 through the persisted IndexStore — identical search
    // plan, the model tables just come from parquet.
    // d17/d18 (semdedup) inherit e7/e11's centroid attach; c9's is
    // the one-row totals attach (the e6/c8 shape).
    // c10's is the ONE-ROW vocabulary attach: without a langCol the
    // LM's join key is a constant, so the broadcast(vocab) equi-join
    // folds to the same one-broadcast-row shape (pipe21, with real
    // lang keys, plans it as a broadcast hash join and is NOT listed);
    // c11 is c10 through the persisted LmStore — identical scoring
    // plan, the model tables just come from parquet.
    val bnljAllowed = Set("d2_jaccard_pairs", "d6_embedding_neardup",
      "e1_ann_brute_topk", "e5_ann_brute_native", "e4_ann_ivf_topk",
      "e6_scalar_quant", "e7_ann_ivf_kmeans", "e11_ann_ivf_portable",
      "e12_ann_ivfpq", "e13_ann_ivfpq_portable", "e14_ann_ivfpq_store",
      "d17_semdedup", "d18_semdedup_portable", "c9_dsir_weights",
      "pipe18_cluster_balance", "c8_temperature_mix", "c10_lm_perplexity",
      // pipe23 is d6's bounded exact-baseline shape over stub media
      // features (broadcast theta-join on an id-filtered subset).
      "c11_lm_store_score", "pipe23_media_neardup")
    // The SMJ ban catches unintended broadcast fallbacks (a small side
    // whose stats got lost — the pipe24 checkpoint case). pipe25's one
    // sort-merge join is the deliberate exception: its left side is
    // the per-doc token-index window, which ALREADY exchanged and
    // sorted the token stream on doc_id — the merge join reuses that
    // exact partitioning+order for free, where a shuffled-hash join
    // would add a per-partition hash table of every doc's pack slot
    // for no gain.
    val smjAllowed = Set("pipe25_token_batches")
    SparkEntry.registry.foreach { q =>
      val plan = q.fn(spark, Sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"${q.name}: cartesian")
      if (!smjAllowed(q.name))
        assert(!plan.contains("SortMergeJoin"), s"${q.name}: sort-merge join")
      assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
        s"${q.name}: UDF in plan")
      if (!bnljAllowed(q.name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${q.name}: unexpected nested-loop join")
    }
  }
}
