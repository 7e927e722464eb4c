package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines: deterministic
  * sampling, shard assignment (the distributed analog of "shuffle the
  * dataset"), and weighted source mixing.
  *
  * All three are built on one stable 40-bit key hash (md5-derived, the
  * same construction [[TextAnalysis.rollingFingerprint]] uses), because
  * at 100 TB the only sane sampling/shuffling primitive is a
  * DETERMINISTIC function of the row key:
  *  - no `rand()`: resampling a grown corpus keeps previously selected
  *    rows selected (stable train/eval splits across harvest rounds);
  *  - no global sort: a training-order "shuffle" becomes a shard id +
  *    an in-shard hash order — hash-partition + in-partition sort,
  *    embarrassingly parallel at any scale;
  *  - every executor computes the same answer with zero coordination,
  *    and the whole thing is a codegen'd filter/projection sitting on
  *    the scan.
  *
  * The seed is part of the hashed text, so independent samples (e.g.
  * train vs held-out) come from different seeds, and a row's fate in
  * one sample says nothing about another.
  */
object Corpus {

  /** Stable 40-bit hash of (key, seed) — portable: both Spark and
    * DuckDB compute `int(hex_prefix_10(md5(key || ':' || seed)))`. */
  def stableHash(key: Column, seed: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + seed))),
      1, 10), 16, 10).cast("long")

  /** Keep ~`pct`% of rows, deterministically by key. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int,
                 seed: String): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct out of range: $pct")
    df.filter(stableHash(col(keyCol), seed) % 100 < pct)
  }

  /** Assign every row to one of `numShards` shards plus a
    * deterministic in-shard position — together a reproducible global
    * "shuffle" for training order without any global sort. Consumers
    * `repartition($"shard").sortWithinPartitions($"pos")` to
    * materialize epoch order; the window here shuffles once on the
    * shard id and sorts within partitions only. */
  def shardAssign(df: DataFrame, keyCol: String, numShards: Int,
                  seed: String): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    val h = stableHash(col(keyCol), seed)
    val shard = (h % numShards).cast("int")
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard"))
          // key breaks 40-bit hash ties so pos is total and stable
          .orderBy(h, col(keyCol))))
  }

  /** Sequence packing — the GPT-style concat-and-chunk: documents are
    * laid out in the deterministic shard order (same hash order as
    * [[shardAssign]]) and the token stream is cut into training
    * sequences of `budgetTokens`. Each doc gets (shard, seq_idx,
    * tok_offset): the sequence its FIRST token lands in and the offset
    * within it — exactly the metadata a loader needs to assemble fixed-
    * length batches without re-tokenizing.
    *
    * Scale shape: one hash shuffle on the shard id and a running-sum
    * window WITHIN each shard (in-partition sort only, no global sort
    * — shards bound the sort size by construction). All-integer
    * arithmetic, so the assignment is bit-stable across engines,
    * retries, and reruns. */
  def packSequences(df: DataFrame, keyCol: String, tokenCountCol: Column,
                    numShards: Int, budgetTokens: Int,
                    seed: String): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val h = stableHash(col(keyCol), seed)
    val shard = (h % numShards).cast("int")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(h, col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__ntok", tokenCountCol.cast("long"))
      .withColumn("shard", shard)
      .withColumn("__cum", sum(col("__ntok")).over(w))
      .withColumn("seq_idx",
        expr(s"(__cum - __ntok) div ${budgetTokens.toLong}").cast("int"))
      .withColumn("tok_offset",
        ((col("__cum") - col("__ntok")) % budgetTokens).cast("int"))
      .drop("__ntok", "__cum")
  }

  /** The nightly APPEND form of [[packSequences]]: place an
    * increment's documents into an ALREADY-PACKED corpus' shards
    * without touching any existing placement. `watermark` is the
    * persisted per-shard pack state — (shard, n_tokens) totals of
    * everything packed so far (one `groupBy(shard).sum` over the
    * standing placements, or carried forward from the last append) —
    * and the increment starts at each shard's NEXT sequence boundary,
    * `ceil(n_tokens / budgetTokens)`: sealed sequences are immutable
    * training artifacts, so an append never extends a partial tail
    * sequence, it opens a fresh one (pad cost < 1 sequence per shard
    * per append). Shard assignment and in-shard order are
    * [[packSequences]]' own, so increment placements depend only on
    * the increment and the watermark — old shards are never re-read,
    * let alone rewritten: append I/O is O(increment), the
    * [[IndexStore.append]] discipline applied to the training-batch
    * artifact. */
  def packSequencesAppend(df: DataFrame, keyCol: String,
                          tokenCountCol: Column, numShards: Int,
                          budgetTokens: Int, seed: String,
                          watermark: DataFrame): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    // Drift guard (the stores' sidecar discipline applied to the pack
    // state): a watermark computed under a different token budget
    // yields ceil boundaries that silently overlap the standing
    // corpus' sealed sequences. [[packWatermark]] stamps its budget as
    // a column; when present it must match. The frame is per-shard
    // tiny by contract (it broadcasts below), so the check is one
    // driver-side collect. A hand-built or pre-stamp watermark (no
    // column) is accepted as asserted-by-caller.
    if (watermark.columns.contains("budget_tokens")) {
      // Cast, don't getInt: a hand-built or unioned watermark may carry
      // the column as long (or with a null), and an opaque
      // ClassCastException here would hide the actual problem. A null
      // budget is refused as loudly as a drifted one.
      val budgets = watermark
        .select(col("budget_tokens").cast("int").as("b")).distinct()
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
        .toSeq
      require(!budgets.contains(None),
        "packSequencesAppend: watermark carries a null (or non-numeric) " +
          "budget_tokens value — refusing to treat an unknown budget as " +
          "matching; rebuild the watermark with packWatermark")
      require(budgets.flatten.forall(_ == budgetTokens),
        s"packSequencesAppend: watermark was computed with " +
          s"budget_tokens=${budgets.flatten.mkString(",")} but this append " +
          s"packs with budgetTokens=$budgetTokens — a drifted budget " +
          "shifts every sealed boundary and overlaps standing sequences")
    }
    // A watermark shard ≥ numShards means the standing corpus was
    // packed under a different shard scheme — those shards could never
    // be written by this append (shard = hash % numShards), so the
    // operator is appending to the wrong corpus or with wrong config.
    val maxShard = watermark.agg(max(col("shard").cast("int"))).head()
    require(maxShard.isNullAt(0) || maxShard.getInt(0) < numShards,
      s"packSequencesAppend: watermark contains shard " +
        s"${maxShard.getInt(0)} but this append packs into " +
        s"numShards=$numShards — the standing corpus used a different " +
        "shard scheme")
    val baseSeqs = watermark
      // max per shard, not a bare select: a watermark unioned across
      // appends (or any frame with repeated shard rows) folds to the
      // farthest free position — the correct resume state — instead of
      // join-multiplying every increment placement.
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(max(col("n_tokens").cast("long")).as("__nt"))
      .select(col("shard"),
        // Integer ceil: the first sequence index the increment may use.
        expr(s"CAST((__nt + ${budgetTokens - 1L}) " +
          s"div ${budgetTokens.toLong} AS INT)").as("__base_seqs"))
    packSequences(df, keyCol, tokenCountCol, numShards, budgetTokens, seed)
      // Left: a shard with no standing tokens starts at sequence 0.
      .join(broadcast(baseSeqs), Seq("shard"), "left")
      .withColumn("seq_idx",
        col("seq_idx") + coalesce(col("__base_seqs"), lit(0)))
      .drop("__base_seqs")
  }

  /** The per-shard pack watermark of a placements frame — (shard,
    * n_tokens) where n_tokens is the first free token position:
    * max(seq_idx·budget + tok_offset + doc tokens). For a corpus
    * packed from sequence 0 this equals the shard's token sum; for a
    * standing artifact that grew by appends it also counts the sealed
    * boundary padding — exactly the state the next
    * [[packSequencesAppend]] must resume from. A nightly job folds it
    * forward (greatest of the previous watermark and the latest
    * increment's) instead of rescanning placement history, keeping
    * watermark maintenance O(increment). */
  def packWatermark(placements: DataFrame, tokenCountCol: Column,
                    budgetTokens: Int): DataFrame =
    placements.groupBy("shard").agg(
      max(col("seq_idx").cast("long") * budgetTokens +
        col("tok_offset") + tokenCountCol.cast("long")).as("n_tokens"))
      // The budget this watermark was computed under, carried as a
      // column so [[packSequencesAppend]] can refuse a drifted resume
      // (it survives the nightly union-and-fold unchanged).
      .withColumn("budget_tokens", lit(budgetTokens))

  /** Sequence packing v2 — deterministic first-fit-decreasing BIN
    * packing to a token budget. Where [[packSequences]] concatenates
    * the stream and cuts at the budget (splitting documents across
    * sequence boundaries), this keeps every document whole: within
    * each hash shard, documents are taken in (token count DESC, key
    * ASC) order and each is placed into the first open bin with room,
    * else opens a new bin — the classic FFD layout (≤ 11/9·OPT + 1
    * bins), reproducible across engines and reruns (no rand()).
    * Documents larger than the budget always get a bin of their own.
    *
    * Output: key, `shard`, `bin_idx` (0-based within the shard),
    * `bin_offset` (tokens already in the bin when this doc was placed
    * — the metadata a loader needs to lay out the batch).
    *
    * Scale shape: ONE aggregation keyed by the hash shard; the FFD
    * fold runs as a codegen'd `aggregate` HOF over the shard's
    * collected (count, key) list — no driver collect, no global sort,
    * no per-doc shuffle. Shards bound both the sort and the O(docs ×
    * bins) fold, exactly like [[stratifiedQuota]] bounds its sort:
    * at 100 TB you raise `numShards` until a shard's (count, key)
    * pairs — ~16 bytes/doc, not the documents themselves — fit
    * comfortably in one task. */
  def packBinsFFD(df: DataFrame, keyCol: String, tokenCountCol: Column,
                  numShards: Int, budgetTokens: Int,
                  seed: String): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val h = stableHash(col(keyCol), seed)
    val shard = (h % numShards).cast("int")
    // (-n, key) structs sort_array ascending = token count DESC with
    // the key as a total deterministic tie-break.
    val perShard = df
      .withColumn("__ntok", tokenCountCol.cast("long"))
      .withColumn("shard", shard)
      .groupBy("shard")
      .agg(sort_array(collect_list(struct(
        (-col("__ntok")).as("negn"), col(keyCol).as("k")))).as("ds"))
    // Typed empty accumulator halves: the assignment list's element
    // type follows the key column's type (derived from ds itself — no
    // hand-written schema to drift), the bin-load list is long.
    val emptyAsg = filter(
      transform(col("ds"), d => struct(d.getField("k").as("k"),
        lit(0).as("bin"), lit(0L).as("off"))),
      _ => lit(false))
    val emptyBins = typedLit(Seq.empty[Long])
    val packed = aggregate(
      col("ds"),
      struct(emptyAsg.as("asg"), emptyBins.as("bins")),
      (acc, d) => {
        val n = -d.getField("negn")
        val bins = acc.getField("bins")
        // First bin with room, 1-based; 0 = none fit → open a bin.
        val pos = array_position(
          transform(bins, b => b + n <= budgetTokens), lit(true))
        val isNew = pos === 0
        val binIdx = when(isNew, size(bins)).otherwise((pos - 1).cast("int"))
        val off = when(isNew, lit(0L))
          .otherwise(element_at(bins, pos.cast("int")))
        struct(
          concat(acc.getField("asg"), array(struct(
            d.getField("k").as("k"), binIdx.as("bin"), off.as("off"))))
            .as("asg"),
          when(isNew, concat(bins, array(n)))
            .otherwise(transform(bins,
              (b, i) => when(i === (pos - 1).cast("int"), b + n)
                .otherwise(b)))
            .as("bins"))
      })
    perShard
      .select(col("shard"), explode(packed.getField("asg")).as("a"))
      .select(col("a.k").as(keyCol), col("shard"),
        col("a.bin").as("bin_idx"), col("a.off").as("bin_offset"))
  }

  /** Weighted mixture: per-source keep rates in percent (e.g. web 10%,
    * reference 100%). Sources absent from `weights` are dropped —
    * explicit inclusion, the convention mixture configs use. One
    * codegen'd filter, no join, no union of N branches: at 100 TB a
    * per-source-DataFrame union would re-scan the corpus once per
    * source, this scans once total. */
  def mixByWeights(df: DataFrame, keyCol: String, sourceCol: String,
                   weights: Map[String, Int], seed: String): DataFrame = {
    weights.values.foreach(p =>
      require(p >= 0 && p <= 100, s"weight out of range: $p"))
    val rate = graft.functions.Scalars.mapLookup(
      col(sourceCol), weights.map { case (k, v) => k -> v.toString },
      lit("-1")).cast("int")
    df.filter(stableHash(col(keyCol), seed) % 100 < rate)
  }

  /** Temperature-flattened stratum mixing (the multilingual-sampling
    * standard, mT5/XLM-R style, at temperature α = 0.5): strata are
    * re-weighted by √count instead of count, so dominant strata
    * (English at 100 TB) are down-sampled and the tail is kept at a
    * higher rate, targeting ~`targetRows` total. α is FIXED at 0.5
    * because √ is the one power IEEE evaluates correctly-rounded in
    * every engine — an arbitrary-α pow() would break the cross-engine
    * hash gate. Weights are quantized (⌊√n·1000⌋) before the global
    * sum so the normalizer is an exact, order-independent integer;
    * every remaining double op is a single deterministic product/
    * division of exact integers.
    *
    * Scale shape: one tiny count aggregation, a ONE-ROW global-sum
    * attach, a broadcast rate join keyed by stratum, and the same
    * codegen'd hash filter as [[hashSample]] on the scan. No per-row
    * shuffle, no rand(); re-running on a grown corpus re-derives the
    * rates from the new counts (rates are a function of the data, so
    * unlike [[hashSample]] membership is only stable while counts
    * are). */
  def temperatureMix(df: DataFrame, keyCol: String, stratumCol: String,
                     targetRows: Long, seed: String): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val counts = df.groupBy(stratumCol)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__wq",
        floor(sqrt(col("__n").cast("double")) * 1000).cast("long"))
    val total = counts.agg(sum(col("__wq")).as("__W"))
    val rates = counts.crossJoin(broadcast(total))
      .withColumn("__rate", least(lit(1.0),
        (col("__wq").cast("double") * targetRows) /
          (col("__W").cast("double") * col("__n").cast("double"))))
      .select(col(stratumCol), col("__rate"))
    df.join(broadcast(rates), stratumCol)
      .filter(stableHash(col(keyCol), seed) % (1L << 20) <
        floor(col("__rate") * (1L << 20)).cast("long"))
      .drop("__rate")
  }

  /** Token-BUDGET-constrained source mixing — the "fill an N-token
    * training budget at these source proportions" assembly knob (the
    * Pile/DoReMi-style mixture spec, stated in tokens rather than
    * rows): source `s` gets allocation `budget·w_s` tokens, its
    * keep-rate is `min(1, budget·w_s / T_s)` against its actual token
    * mass `T_s`, and rows are kept by the deterministic stable-hash
    * filter. A source with less mass than its allocation is kept
    * whole (rate 1 — the standard shortfall semantics; upsampling to
    * make up the difference is the training loader's epoch knob, not
    * a corpus-assembly rewrite). Sources without a weight drop.
    *
    * Scale shape: ONE aggregate for the per-source token totals, the
    * bounded rate table broadcast back, and the keep decision is a
    * scan-local integer comparison — no per-doc shuffle, no rand(),
    * stable under resampling like every mix in this family. The
    * allocation products are precomputed driver-side so both engines
    * evaluate the identical `alloc / T` division (bit-stable rates →
    * bit-stable integer thresholds → identical keep sets). */
  def budgetMix(df: DataFrame, keyCol: String, sourceCol: String,
                tokenCount: Column, weights: Map[String, Double],
                budgetTokens: Long, seed: String): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    require(weights.nonEmpty && weights.values.forall(_ >= 0),
      "budgetMix: weights must be non-empty and non-negative")
    val alloc = weights.toSeq.sortBy(_._1)
      .map { case (s, w) => (s, w * budgetTokens.toDouble) }
    val allocCase = alloc.tail.foldLeft(
      when(col(sourceCol) === alloc.head._1, lit(alloc.head._2))) {
      case (acc, (s, a)) => acc.when(col(sourceCol) === s, lit(a))
    }.otherwise(lit(0.0))
    val totals = df.groupBy(sourceCol)
      .agg(sum(tokenCount.cast("long")).as("__T"))
    val rates = totals
      .withColumn("__rate", least(lit(1.0),
        allocCase / col("__T").cast("double")))
      .select(col(sourceCol), col("__rate"))
    df.join(broadcast(rates), sourceCol)
      .filter(stableHash(col(keyCol), seed) % (1L << 20) <
        floor(col("__rate") * (1L << 20)).cast("long"))
      .drop("__rate")
  }

  /** Overlapping token-window chunking — the embedding-pipeline
    * staple: every document explodes into fixed-size chunks of
    * `size` tokens advancing by `size - overlap`, so consecutive
    * chunks share `overlap` tokens of context. Chunk count is
    * `max(1, ceil((n - overlap) / stride))` — every token lands in at
    * least one chunk and no chunk starts beyond the text. Empty text
    * yields ONE empty chunk (the tokenizer's split of "" is [""], the
    * same contract as the oracle's string_split); null text yields no
    * chunks. Pure per-row generator (one explode), no shuffle;
    * all-integer arithmetic so chunk boundaries are bit-stable across
    * engines and reruns. */
  def chunk(df: DataFrame, keyCol: String, textCol: String,
            size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size: size=$size overlap=$overlap")
    val stride = size - overlap
    // Tokens staged behind a generator barrier (the repetitionStats
    // pattern) so the per-chunk lambda doesn't re-tokenize.
    df.select(col(keyCol),
        explode(array(graft.functions.Scalars.tokens(col(textCol)))).as("__t"))
      .select(col(keyCol), posexplode(
        // Null text → null tokens → no chunks (a bare `otherwise`
        // would emit one phantom (0, null) chunk because
        // greatest(1, null) = 1); the tokenizer never yields an
        // empty array for non-null text.
        when(col("__t").isNull, typedLit(Seq.empty[String]))
          .otherwise(transform(
            sequence(lit(0), greatest(lit(1),
              ceil((size_(col("__t")) - overlap).cast("double") / stride)
                .cast("int")) - 1),
            i => array_join(slice(col("__t"), i * stride + 1, lit(size)), " "))))
        .as(Seq("chunk_idx", "chunk_text")))
  }

  private def size_(c: Column) = org.apache.spark.sql.functions.size(c)

  /** Per-stratum quota sampling: keep at most `quota` rows per stratum
    * (language, source, length bucket, …), chosen deterministically by
    * stable-hash order — the "cap the dominant language / oversample
    * the tail" knob of corpus assembly, reproducible across reruns
    * and engines (no rand()).
    *
    * Scale shape: one hash shuffle on the stratum + an in-partition
    * sort; stratum size bounds the sort. For a stratum so hot it
    * overwhelms one partition (English at 100 TB), pre-thin with
    * [[hashSample]] to ~quota×safety first — the window then ranks a
    * bounded candidate set; determinism composes because both steps
    * key on the same stable hash. */
  def stratifiedQuota(df: DataFrame, keyCol: String, stratumCol: String,
                      quota: Int, seed: String): DataFrame = {
    require(quota >= 0, s"quota must be >= 0: $quota")
    val h = stableHash(col(keyCol), seed)
    df.withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(stratumCol))
          // key breaks 40-bit hash ties so the cut is total and stable
          .orderBy(h, col(keyCol))))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }

  /** DSIR-shaped importance weighting (Xie et al. 2023, arXiv:2302.03169):
    * score every document by how much more likely its hashed-bigram
    * features are under a TARGET corpus slice (`targetPred`, e.g. a
    * high-quality language or domain) than under the raw corpus, then
    * select the top-`topN` deterministically. This is the "select
    * pre-training data that looks like the target" primitive; the
    * feature model is DSIR's hashed bag-of-bigrams with add-one
    * smoothing.
    *
    * Per-feature log-likelihood ratio
    * `llr_f = ln( (n_target_f + 1)·(N_raw + B) / ((n_raw_f + 1)·(N_target + B)) )`
    * is INTEGER-QUANTIZED at 1e-6 (floor(x·10⁶ + 0.5)) the moment it
    * is computed, so every per-document weight is an exact integer
    * dot product `Σ_f c_f · llr_q_f` — deterministic under any
    * aggregation order, engine-portable (ln of an exact rational is
    * the only float step and the 1e-6 grid absorbs its ulp), and
    * hash-gateable. Weights are in ln-units × 1e6 × feature-count.
    *
    * Scale shape: the feature space is bounded (`buckets`), so the
    * model is two tiny tables — the (f, llr) table broadcasts, the
    * per-doc weight is one map-side-combinable sum, and top-N
    * selection is a TakeOrdered (orderBy+limit — never a global
    * single-partition window). Nothing anywhere is proportional to
    * corpus² ; the full pass is two scans (count features, score).
    *
    * DSIR proper samples ∝ exp(weight) with Gumbel noise; the
    * deterministic top-N here is the reproducible variant (same
    * rationale as every rand()-free operator in this module), and a
    * caller who wants softness composes [[hashSample]] upstream.
    *
    * Output: (id, weight BIGINT, selected BOOLEAN) for every doc. */
  def dsirWeights(docs: DataFrame, id: String, text: String,
                  targetPred: Column, buckets: Int = 1024,
                  topN: Int = 100): DataFrame = {
    require(buckets >= 2 && topN >= 0, "dsirWeights: buckets >= 2, topN >= 0")
    // Generator barrier: bind the token array to an attribute before
    // the bigram lambda (shinglesOfTokens' O(tokens²) re-tokenize
    // hazard).
    val toks = docs.select(col(id).as("__id"), targetPred.as("__t"),
      explode(array(graft.functions.Scalars.tokens(col(text)))).as("tk"))
    val bigrams = toks.select(col("__id"), col("__t"),
      explode(when(size(col("tk")) >= 2,
        transform(sequence(lit(0), size(col("tk")) - 2),
          i => array_join(slice(col("tk"), i + 1, lit(2)), " ")))
        .otherwise(array().cast("array<string>"))).as("bg"))
    val feats = bigrams.select(col("__id"), col("__t"),
      pmod(conv(substring(md5(col("bg")), 1, 8), 16, 10).cast("long"),
        lit(buckets.toLong)).as("f"))
    val perDoc = feats.groupBy("__id", "__t", "f")
      .agg(count(lit(1)).as("c"))
    val perFeat = perDoc.groupBy("f").agg(
      coalesce(sum(when(col("__t"), col("c"))), lit(0L)).as("nt"),
      sum(col("c")).as("nr"))
    val totals = perFeat.agg(sum("nt").as("totT"), sum("nr").as("totR"))
    // Each factor is cast to double BEFORE the multiply: at the 100 TB
    // corpus scale this module documents (per-feature counts ~1e10,
    // totals ~1e13) a long×long product overflows Int64. double×double
    // of exactly-representable longs rounds the exact product once —
    // bit-identical to the old long-product-then-cast below 2^53, and
    // correct above it.
    val llr = perFeat.crossJoin(broadcast(totals)).select(col("f"),
      floor(log(((col("nt") + 1).cast("double") *
          (col("totR") + buckets).cast("double")) /
        ((col("nr") + 1).cast("double") *
          (col("totT") + buckets).cast("double"))) * 1e6 + 0.5)
        .cast("long").as("llr"))
    val weights = perDoc.join(broadcast(llr), Seq("f"))
      .groupBy("__id").agg(sum(col("c") * col("llr")).as("weight"))
    // Bigram-less docs still get a row (weight 0), attached with a
    // union + re-aggregate instead of a left join (the scored lineage's
    // inflated join estimates would force a sort-merge plan; the union
    // rides the same id-keyed shuffle).
    val allDocs = docs.select(col(id).as("__id"), lit(0L).as("weight"))
      .unionByName(weights)
      .groupBy("__id").agg(sum("weight").as("weight"))
    // Top-N selection: TakeOrdered (never a single-partition global
    // window), and the N selected ids are bounded — broadcast them.
    val top = allDocs.orderBy(col("weight").desc, col("__id")).limit(topN)
      .select(col("__id"), lit(true).as("__sel"))
    allDocs.join(broadcast(top), Seq("__id"), "left")
      .select(col("__id").as(id), col("weight"),
        coalesce(col("__sel"), lit(false)).as("selected"))
  }

  /** CCNet-shaped quality scoring (Wenzek et al. 2020): train an
    * add-one-smoothed BIGRAM language model on a reference slice of
    * the corpus (`refPred` — CCNet's Wikipedia), then score EVERY
    * document by its total log-likelihood under that model. Optionally
    * one model per language (`langCol` — CCNet trains one LM per
    * language and buckets within it; [[ccnetBuckets]] is that second
    * half).
    *
    * Determinism discipline (the [[dsirWeights]] contract): the ONLY
    * float step is the `ln` of a bigram's model probability, quantized
    * to the 1e-6 ln-grid the moment it is computed — each occurrence
    * of the same (lang, bigram) quantizes to the same integer, so doc
    * scores are exact integer sums and the whole path replays
    * bit-identically in any engine. `ln P(w2|w1) = ln((c2+1)/(c1+V))`
    * with `c2` the ref count of the bigram, `c1` the ref count of
    * bigrams starting `w1`, and `V` the ref distinct-token vocabulary
    * (`max(V,1)`: a language with no reference text scores 0
    * everywhere rather than ±inf).
    *
    * Scale shape: the model is two aggregates over the REFERENCE slice
    * only — bounded by the reference vocabulary, independent of corpus
    * size — so scoring is the corpus' bigram stream joined against
    * BROADCAST model tables (zero shuffle) followed by ONE
    * map-side-combinable per-doc sum. A deployment whose reference
    * slice outgrows broadcast (a multi-GB bigram table) passes
    * `broadcastModel = false` and gets pinned shuffled-hash model
    * joins instead — never a sort-merge. Nothing anywhere is
    * proportional to corpus², and no step sorts globally.
    *
    * Output: (id[, lang], n_bigrams, lp_sum_e6) for EVERY input doc —
    * bigram-less docs (≤1 token) get (0, 0), attached with the union +
    * re-aggregate trick (not a left join) so the attach rides the same
    * id-keyed shuffle. `lp_sum_e6` ≤ 0; closer to 0 = more reference-
    * like (lower perplexity). */
  def lmScore(docs: DataFrame, id: String, text: String,
              refPred: Column, langCol: Option[String] = None,
              broadcastModel: Boolean = true,
              hashed: Boolean = false): DataFrame =
    lmScoreWith(docs, id, text,
      lmTrain(docs.filter(refPred), id, text, langCol, hashed),
      langCol, broadcastModel, hashed)

  /** An add-one bigram LM as three count tables, each keyed by
    * (__lang, key): `bigrams` (bgk, c2), `contexts` (w1k, c1), and
    * `tokens` (tkk, c — the distinct-token table WITH occurrence
    * counts, so vocabulary size is its per-lang row count and two
    * models merge by summing counts; a bare distinct set could not be
    * subtracted on reference takedown). Keys are strings (portable)
    * or xxhash64 (production) — a model trained one way cannot score
    * the other ([[LmStore]] enforces that on its sidecar). */
  case class LmModel(bigrams: DataFrame, contexts: DataFrame,
                     tokens: DataFrame)

  /** The per-occurrence (context-key, bigram-key) stream under one
    * tokenize. Portable: the keys are the strings themselves
    * (DuckDB-replayable). Production (`hashed`): multi-arg xxhash64
    * keys, NO bigram string ever allocated — the pipe17 hashNgrams
    * discipline; counts (and hence scores) are identical up to 64-bit
    * key collisions, and CorpusSpec pins the two forms' outputs
    * equal. Returns (tokens-staged, pairs); the generator barrier
    * before the bigram lambda is the same O(tokens²) re-tokenize
    * hazard dsirWeights documents. */
  private def bigramPairs(docs: DataFrame, id: String, text: String,
                          lang: Column, hashed: Boolean)
      : (DataFrame, DataFrame) = {
    val toks = docs.select(col(id).as("__id"), lang.as("__lang"),
      explode(array(graft.functions.Scalars.tokens(col(text)))).as("tk"))
    val pairs =
      if (hashed) {
        // Production keys straight off the text bytes: the native
        // n-gram hash arrays for n=1 (token hashes = context keys) and
        // n=2 (bigram keys), zipped positionally — bit-identical to
        // the per-position xxhash64 lambda (same seed-42 chain), with
        // the interpreted transform/element_at walk replaced by two
        // compiled byte passes. CorpusSpec pins hashed ≡ portable
        // scores, which rides this path.
        graft.plans.NgramHashesExpr.register(docs.sparkSession)
        def ng(n: Int) = call_function(
          graft.plans.NgramHashesExpr.Name, col(text), lit(n))
        // zip_with pads the shorter bigram array with null at the last
        // token position; real keys are never null, so the null filter
        // trims exactly that pad.
        docs.select(col(id).as("__id"), lang.as("__lang"),
          explode(zip_with(ng(1), ng(2),
            (a, b) => struct(a.as("w1k"), b.as("bgk")))).as("p"))
          .filter(col("p.bgk").isNotNull)
          .select(col("__id"), col("__lang"),
            col("p.w1k").as("w1k"), col("p.bgk").as("bgk"))
      }
      else toks.select(col("__id"), col("__lang"),
        explode(when(size(col("tk")) >= 2,
          transform(sequence(lit(0), size(col("tk")) - 2),
            i => array_join(slice(col("tk"), i + 1, lit(2)), " ")))
          .otherwise(array().cast("array<string>"))).as("bgk"))
        .withColumn("w1k", substring_index(col("bgk"), " ", 1))
    (toks, pairs)
  }

  /** Train the model half of [[lmScore]] on `refDocs` (the caller
    * pre-filters to the reference slice): bigram counts, context
    * counts (= bigram rows sharing the start token), counted distinct
    * tokens. Three aggregates over the reference slice — bounded by
    * its vocabulary, independent of the corpus that will be scored. */
  def lmTrain(refDocs: DataFrame, id: String, text: String,
              langCol: Option[String] = None,
              hashed: Boolean = false): LmModel = {
    val lang = langCol.map(col).getOrElse(lit(""))
    val (toks, pairs) = bigramPairs(refDocs, id, text, lang, hashed)
    val c2 = pairs.groupBy("__lang", "bgk").agg(count(lit(1)).as("c2"))
    val c1 = pairs.groupBy("__lang", "w1k").agg(count(lit(1)).as("c1"))
    val tk = toks.select(col("__lang"), explode(col("tk")).as("w"))
      .select(col("__lang"),
        (if (hashed) xxhash64(col("w")) else col("w")).as("tkk"))
      .groupBy("__lang", "tkk").agg(count(lit(1)).as("c"))
    LmModel(c2, c1, tk)
  }

  /** Score `docs` under an already-trained (possibly [[LmStore]]-
    * persisted) model — the scoring half of [[lmScore]]; `langCol` and
    * `hashed` must match the training call. */
  def lmScoreWith(docs: DataFrame, id: String, text: String,
                  lm: LmModel, langCol: Option[String] = None,
                  broadcastModel: Boolean = true,
                  hashed: Boolean = false): DataFrame = {
    val lang = langCol.map(col).getOrElse(lit(""))
    val (_, pairs) = bigramPairs(docs, id, text, lang, hashed)
    val vocab = lm.tokens.groupBy("__lang").agg(count(lit(1)).as("v"))
    // Scoring: every bigram occurrence joined straight to the model
    // (no per-doc-bigram pre-aggregate, no scoring-vocab
    // materialization — both would shuffle the full occurrence stream
    // on a high-cardinality key), then ONE per-doc sum. The quantized
    // lp of an occurrence equals the per-distinct-feature value, so
    // the sum is the same exact integer dot product.
    val model = (df: DataFrame) =>
      if (broadcastModel) broadcast(df) else df.hint("shuffle_hash")
    val occ = pairs
      .join(model(lm.bigrams), Seq("__lang", "bgk"), "left")
      .join(model(lm.contexts), Seq("__lang", "w1k"), "left")
      .join(broadcast(vocab), Seq("__lang"), "left")
      .select(col("__id"), col("__lang"),
        floor(log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
            (coalesce(col("c1"), lit(0L)) +
              greatest(coalesce(col("v"), lit(0L)), lit(1L))).cast("double"))
          * 1e6 + 0.5).cast("long").as("lp"))
    val scored = occ.groupBy("__id", "__lang")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("lp_sum_e6"))
    val withEmpty = docs.select(col(id).as("__id"), lang.as("__lang"),
        lit(0L).as("n_bigrams"), lit(0L).as("lp_sum_e6"))
      .unionByName(scored)
      .groupBy("__id", "__lang").agg(sum("n_bigrams").as("n_bigrams"),
        sum("lp_sum_e6").as("lp_sum_e6"))
    val base = withEmpty.select(col("__id").as(id), col("__lang"),
      col("n_bigrams"), col("lp_sum_e6"))
    langCol match {
      case Some(lc) => base.withColumnRenamed("__lang", lc)
      case None     => base.drop("__lang")
    }
  }

  /** The second half of CCNet: per-language head/middle/tail buckets by
    * LM perplexity percentile. Input is [[lmScore]]'s per-doc output
    * (with a lang column); each scored doc gets an integer average-NLL
    * rank key `avg_nll_e9 = (-lp_sum_e6) * 1000 div n_bigrams` (both
    * operands non-negative, so truncating and flooring division agree
    * in every engine), and the p30/p70 cutoffs are computed from the
    * per-(lang, avg_nll_e9) HISTOGRAM — the running-sum window scans
    * the tiny aggregated histogram partitioned by language, never the
    * per-doc table, so the sort that would be a single-partition
    * catastrophe at 100 TB never materializes. Cutoff q30 = smallest
    * key with cumulative ≥ 30% of the language's scored docs (ditto
    * q70); bucket = head (best 30%), middle, tail. Bigram-less docs
    * have no perplexity and land in tail.
    *
    * Output: (id, lang, avg_nll_e9, bucket). */
  def ccnetBuckets(scored: DataFrame, id: String, lang: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Bigram-less docs get the -1 sentinel (real keys are ≥ 0 — lp ≤ 0
    // makes -lp_sum_e6 non-negative), not NULL: the oracle hash-compare
    // stays engine-neutral and the tail rule below stays one CASE.
    val q = scored.select(col(id), col(lang),
      when(col("n_bigrams") === 0, lit(-1L))
        .otherwise(expr("(-lp_sum_e6) * 1000L div n_bigrams"))
        .as("avg_nll_e9"))
    val hist = q.filter(col("avg_nll_e9") =!= -1L)
      .groupBy(col(lang), col("avg_nll_e9")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(lang)).orderBy(col("avg_nll_e9"))
    val tot = Window.partitionBy(col(lang))
    val cuts = hist
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("tot", sum("cnt").over(tot))
      .groupBy(col(lang)).agg(
        min(when(col("cum") * 10 >= col("tot") * 3, col("avg_nll_e9")))
          .as("q30"),
        min(when(col("cum") * 10 >= col("tot") * 7, col("avg_nll_e9")))
          .as("q70"))
    q.join(broadcast(cuts), Seq(lang), "left")
      .select(col(id), col(lang), col("avg_nll_e9"),
        when(col("avg_nll_e9") === -1L, lit("tail"))
          .when(col("avg_nll_e9") <= col("q30"), lit("head"))
          .when(col("avg_nll_e9") <= col("q70"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
