package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.Corpus

/** Registered queries for the corpus-assembly operators
  * ([[graft.llm.Corpus]]): deterministic hash sampling, shard
  * assignment (reproducible training-order "shuffle"), and weighted
  * source mixing. All three are oracle-backed — the 40-bit md5 key
  * hash is computed identically in DuckDB (`'0x' || substr(md5(..)`),
  * so sampling decisions hash-match row for row. */
object CorpusQueries {

  /** Mixture config for c3 — sources absent from the map are dropped
    * (explicit inclusion). */
  val MixWeights: Map[String, Int] = Map(
    "src0" -> 100, "src1" -> 60, "src2" -> 25, "src3" -> 10, "src4" -> 5)

  /** c12's mixture spec: decimal weights with exact double literals
    * (0.5 = 2^-1 etc.) and a budget placing src0 ABOVE its token mass
    * at sf0.01 (whole-source regime) while src1-3 subsample. */
  val BudgetMixWeights: Map[String, Double] = Map(
    "src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.15, "src3" -> 0.05)
  val BudgetMixTokens: Long = 3000L

  private def hashSql(seed: String): String =
    s"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':$seed'), 1, 10)) AS BIGINT)"

  /** The c10 LM-scoring oracle — shared verbatim by c11 (the
    * store-backed path), whose results must be indistinguishable from
    * the ephemeral train+score. */
  private val LmScoreOracleSql: String =
    """WITH base AS (
      |  SELECT doc_id, source = 'src0' AS ref,
      |         string_split(trim(text), ' ') AS tk
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, ref, unnest(CASE WHEN len(tk) >= 2 THEN
      |      list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
      |    ELSE []::VARCHAR[] END) AS b
      |  FROM base),
      |c2 AS (SELECT b, count(*) AS c2 FROM bg WHERE ref GROUP BY b),
      |c1 AS (SELECT split_part(b, ' ', 1) AS w1, sum(c2) AS c1
      |       FROM c2 GROUP BY 1),
      |v AS (SELECT count(DISTINCT t) AS v FROM (
      |        SELECT unnest(tk) AS t FROM base WHERE ref)),
      |dc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
      |lp AS (SELECT d.b,
      |         CAST(floor(ln(CAST(coalesce(c2.c2, 0) + 1 AS DOUBLE) /
      |                       CAST(coalesce(c1.c1, 0)
      |                            + greatest(v.v, 1) AS DOUBLE))
      |                    * 1e6 + 0.5) AS BIGINT) AS lp
      |       FROM (SELECT DISTINCT b FROM dc) d
      |       LEFT JOIN c2 USING (b)
      |       LEFT JOIN c1 ON split_part(d.b, ' ', 1) = c1.w1
      |       CROSS JOIN v),
      |w AS (SELECT dc.doc_id, CAST(sum(dc.c) AS BIGINT) AS n_bigrams,
      |             CAST(sum(dc.c * lp.lp) AS BIGINT) AS lp_sum_e6
      |      FROM dc JOIN lp USING (b) GROUP BY dc.doc_id)
      |SELECT d.doc_id, coalesce(w.n_bigrams, 0) AS n_bigrams,
      |       coalesce(w.lp_sum_e6, 0) AS lp_sum_e6
      |FROM (SELECT DISTINCT doc_id FROM documents) d
      |LEFT JOIN w USING (doc_id)""".stripMargin

  def all: Seq[Q] = Seq(

    // Deterministic ~10% sample: a codegen'd filter on the scan, no
    // rand() (stable across reruns and corpus growth), no shuffle.
    Q("c1_hash_sample",
      s"""SELECT doc_id, source
         |FROM (SELECT doc_id, source, ${hashSql("train")} AS hv
         |      FROM documents)
         |WHERE hv % 100 < 10""".stripMargin) { (s, d) =>
      Corpus.hashSample(Tables.documents(s, d), "doc_id", 10, "train")
        .select("doc_id", "source")
    },

    // Shard + in-shard position: the distributed "shuffle the
    // dataset" — one hash shuffle on the shard id, in-partition sort
    // only, never a global sort.
    Q("c2_shard_assign",
      s"""SELECT doc_id, CAST(hv % 8 AS INT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY hv % 8
         |       ORDER BY hv, doc_id) AS INT) AS pos
         |FROM (SELECT doc_id, ${hashSql("epoch0")} AS hv FROM documents)"""
        .stripMargin) { (s, d) =>
      Corpus.shardAssign(Tables.documents(s, d), "doc_id", 8, "epoch0")
        .select("doc_id", "shard", "pos")
    },

    // Sequence packing: concat-and-chunk layout metadata (shard,
    // seq_idx, tok_offset) from a per-shard running token sum — one
    // hash shuffle, in-partition sort only, all-integer arithmetic.
    Q("c4_sequence_pack",
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS ntok,
         |    ${hashSql("pack")} AS hv
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, CAST(hv % 8 AS INT) AS shard, ntok,
         |    sum(ntok) OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t)
         |SELECT doc_id, shard,
         |  CAST((cum - ntok) // 2048 AS INT) AS seq_idx,
         |  CAST((cum - ntok) % 2048 AS INT) AS tok_offset
         |FROM c""".stripMargin) { (s, d) =>
      Corpus.packSequences(Tables.documents(s, d), "doc_id",
        size(graft.functions.Scalars.tokens(col("text"))),
        numShards = 8, budgetTokens = 2048, seed = "pack")
        .select("doc_id", "shard", "seq_idx", "tok_offset")
    },

    // Sequence packing v2: deterministic first-fit-decreasing BIN
    // packing (documents kept whole, budget 256 tokens, 32 hash
    // shards). The oracle replays the same FFD fold in DuckDB via
    // list_reduce over a flat BIGINT[][] accumulator (acc[1] = bin
    // loads, acc[2:] = (key, bin, offset) triples — DuckDB 1.0's
    // list_reduce drops struct-typed accumulator fields, so the state
    // is list-encoded), placing docs in the same (-n, key) sort order
    // with the same first-fit rule, so layouts match bit for bit.
    Q("c7_bin_packing",
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n,
         |    CAST(${hashSql("pk")} % 32 AS INT) AS shard
         |  FROM documents),
         |g AS (
         |  SELECT shard, list_sort(list(([-n, doc_id])::BIGINT[])) AS ds
         |  FROM base GROUP BY shard),
         |f AS (
         |  SELECT shard,
         |    list_reduce(
         |      list_prepend([[]]::BIGINT[][], list_transform(ds, d -> [d])),
         |      (acc, d) ->
         |        CASE WHEN list_position(
         |               list_transform(acc[1], b -> b - d[1][1] <= 256),
         |               true) = 0
         |        THEN list_prepend(list_append(acc[1], -d[1][1]),
         |             list_append(acc[2:],
         |               [d[1][2], CAST(len(acc[1]) AS BIGINT), 0]))
         |        ELSE list_prepend(
         |             list_transform(acc[1], (b, i) ->
         |               CASE WHEN i = list_position(list_transform(acc[1],
         |                 b2 -> b2 - d[1][1] <= 256), true)
         |               THEN b - d[1][1] ELSE b END),
         |             list_append(acc[2:],
         |               [d[1][2],
         |                CAST(list_position(list_transform(acc[1],
         |                  b3 -> b3 - d[1][1] <= 256), true) - 1 AS BIGINT),
         |                acc[1][list_position(list_transform(acc[1],
         |                  b4 -> b4 - d[1][1] <= 256), true)]]))
         |        END) AS acc
         |  FROM g)
         |SELECT t[1] AS doc_id, shard, CAST(t[2] AS INT) AS bin_idx,
         |       t[3] AS bin_offset
         |FROM (SELECT shard, unnest(acc[2:]) AS t FROM f)""".stripMargin) {
      (s, d) =>
      Corpus.packBinsFFD(Tables.documents(s, d), "doc_id",
          size(graft.functions.Scalars.tokens(col("text"))),
          numShards = 32, budgetTokens = 256, seed = "pk")
        .select("doc_id", "shard", "bin_idx", "bin_offset")
    },

    // Weighted mixture in ONE scan: per-source keep-rate via a literal
    // CASE, rather than per-source unions that would re-scan the
    // corpus once per source.
    Q("c3_weighted_mix", {
      val rateCase = MixWeights.toSeq.sorted
        .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ")
      s"""SELECT doc_id, source
         |FROM (SELECT doc_id, source, ${hashSql("mix")} AS hv
         |      FROM documents)
         |WHERE hv % 100 < CASE source $rateCase ELSE -1 END""".stripMargin
    }) { (s, d) =>
      Corpus.mixByWeights(Tables.documents(s, d), "doc_id", "source",
        MixWeights, "mix").select("doc_id", "source")
    },

    // Temperature-flattened language mixing (α = 0.5): dominant
    // languages down-weighted by √count, targeting ~200 rows. √ is
    // correctly-rounded in both engines and the weight sum is an
    // exact integer, so the per-stratum rates — and therefore the
    // hash-filter decisions — match bit for bit.
    Q("c8_temperature_mix",
      s"""WITH counts AS (
         |  SELECT lang, count(*) AS n,
         |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000) AS BIGINT)
         |      AS wq
         |  FROM documents GROUP BY lang),
         |tot AS (SELECT sum(wq) AS w FROM counts),
         |rates AS (
         |  SELECT lang, least(1.0,
         |    (CAST(wq AS DOUBLE) * 200) / (CAST(w AS DOUBLE)
         |      * CAST(n AS DOUBLE))) AS rate
         |  FROM counts CROSS JOIN tot)
         |SELECT d.doc_id, d.lang
         |FROM documents d JOIN rates r ON d.lang = r.lang
         |WHERE ${hashSql("temp")} % 1048576
         |      < CAST(floor(r.rate * 1048576) AS BIGINT)""".stripMargin) {
      (s, d) =>
      Corpus.temperatureMix(Tables.documents(s, d), "doc_id", "lang",
        targetRows = 200, seed = "temp").select("doc_id", "lang")
    },

    // Token-BUDGET-constrained source mix: the mixture spec stated in
    // tokens (the Pile/DoReMi shape) — per-source keep-rate =
    // min(1, budget·w / token_mass). Weights chosen so the SF corpus
    // exercises BOTH regimes: src0's allocation exceeds its mass
    // (rate 1, kept whole) while src1-3 subsample. The allocation
    // products are literals on both sides, so the rate division — and
    // hence the integer thresholds — match bit for bit.
    Q("c12_budget_mix", {
      val allocCase = BudgetMixWeights.toSeq.sortBy(_._1)
        .map { case (k, w) => s"WHEN '$k' THEN ${w * BudgetMixTokens}" }
        .mkString(" ")
      s"""WITH dw AS (
         |  SELECT doc_id, source,
         |    len(list_filter(string_split(trim(text), ' '),
         |      w -> len(w) > 0)) AS n
         |  FROM documents),
         |tot AS (SELECT source, sum(n) AS t FROM dw GROUP BY source),
         |rates AS (SELECT source, least(1.0,
         |    (CASE source $allocCase ELSE 0.0 END)
         |      / CAST(t AS DOUBLE)) AS rate FROM tot)
         |SELECT d.doc_id, d.source
         |FROM documents d JOIN rates r USING (source)
         |WHERE ${hashSql("bud")} % 1048576
         |      < CAST(floor(r.rate * 1048576) AS BIGINT)""".stripMargin
    }) { (s, d) =>
      Corpus.budgetMix(Tables.documents(s, d), "doc_id", "source",
        size(filter(graft.functions.Scalars.tokens(col("text")),
          w => length(w) > 0)),
        BudgetMixWeights, BudgetMixTokens, "bud")
        .select("doc_id", "source")
    },

    // Per-stratum deterministic quota: cap every language at 30 docs,
    // chosen by stable-hash order (the "cap the dominant language"
    // corpus-assembly knob). One shuffle on the stratum, in-partition
    // sort only, rand()-free.
    Q("c5_stratified_quota",
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
         |    ORDER BY ${hashSql("cap")}, doc_id) AS rk
         |  FROM documents) WHERE rk <= 30""".stripMargin) { (s, d) =>
      Corpus.stratifiedQuota(Tables.documents(s, d), "doc_id", "lang",
        30, "cap").select("doc_id", "lang")
    },

    // DSIR-shaped importance weighting (Xie et al. 2023): hashed-bigram
    // add-one-smoothed target/raw log-likelihood ratios, integer-
    // quantized per feature the moment they're computed, so every doc
    // weight is an exact integer dot product — the whole path
    // (bigrams, md5 feature hashing, counts, quantized llr, weights,
    // deterministic top-100 selection) replays in DuckDB. Target =
    // English slice; raw = full corpus.
    Q("c9_dsir_weights",
      """WITH base AS (
        |  SELECT doc_id, lang = 'en' AS t,
        |         string_split(trim(text), ' ') AS tk
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, t, unnest(CASE WHEN len(tk) >= 2 THEN
        |      list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
        |    ELSE []::VARCHAR[] END) AS b
        |  FROM base),
        |f AS (SELECT doc_id, t,
        |        CAST(('0x' || substr(md5(b), 1, 8)) AS BIGINT) % 1024 AS f
        |      FROM bg),
        |dc AS (SELECT doc_id, t, f, count(*) AS c FROM f GROUP BY doc_id, t, f),
        |gl AS (SELECT f, coalesce(sum(CASE WHEN t THEN c END), 0) AS nt,
        |              sum(c) AS nr
        |       FROM dc GROUP BY f),
        |tot AS (SELECT sum(nt) AS ct, sum(nr) AS cr FROM gl),
        |llr AS (SELECT f,
        |          CAST(floor(ln((CAST(nt + 1 AS DOUBLE) * CAST(cr + 1024 AS DOUBLE)) /
        |                        (CAST(nr + 1 AS DOUBLE) * CAST(ct + 1024 AS DOUBLE)))
        |                     * 1e6 + 0.5) AS BIGINT) AS llr
        |        FROM gl CROSS JOIN tot),
        |w AS (SELECT dc.doc_id, CAST(sum(dc.c * llr.llr) AS BIGINT) AS weight
        |      FROM dc JOIN llr USING (f) GROUP BY dc.doc_id),
        |aw AS (SELECT d.doc_id, coalesce(w.weight, 0) AS weight
        |       FROM (SELECT DISTINCT doc_id FROM documents) d
        |       LEFT JOIN w USING (doc_id))
        |SELECT doc_id, weight,
        |       row_number() OVER (ORDER BY weight DESC, doc_id) <= 100
        |         AS selected
        |FROM aw""".stripMargin) { (s, d) =>
      Corpus.dsirWeights(Tables.documents(s, d), "doc_id", "text",
        targetPred = col("lang") === "en", buckets = 1024, topN = 100)
    },

    // CCNet-shaped LM quality score (Wenzek et al. 2020): add-one
    // bigram LM trained on the src0 reference slice, every doc scored
    // by total log-likelihood. One quantized ln per distinct bigram
    // (the c9 float discipline) makes each doc score an exact integer
    // dot product — the whole train+score path replays in DuckDB.
    Q("c10_lm_perplexity", LmScoreOracleSql) { (s, d) =>
      Corpus.lmScore(Tables.documents(s, d), "doc_id", "text",
        refPred = col("source") === "src0")
    },

    // The same scoring THROUGH the persisted model ([[graft.llm
    // .LmStore]]): train-once/score-nightly. Shares c10's oracle
    // verbatim because the store round-trip must be invisible to
    // results — that equality IS the artifact-fidelity gate (the e14
    // discipline).
    Q("c11_lm_store_score", LmScoreOracleSql) { (s, d) =>
      import graft.llm.LmStore
      val dir = Fixtures.stampedDir(d, "documents", "lm_store", 1)
        .resolve("lm").toString
      val params = LmStore.Params(langCol = None, hashed = false)
      LmStore.build(Tables.documents(s, d).filter(col("source") === "src0"),
        "doc_id", "text", dir, params)
      LmStore.score(s, dir, params, Tables.documents(s, d),
        "doc_id", "text")
    },

    // The full CCNet bucketing pipeline: one LM per LANGUAGE over the
    // reference slice, then per-language head/middle/tail buckets at
    // the p30/p70 perplexity percentiles. The cutoffs come from the
    // per-(lang, score) HISTOGRAM (a window over the tiny aggregate,
    // never a per-doc global sort).
    Q("pipe21_ccnet",
      """WITH base AS (
        |  SELECT doc_id, lang, source = 'src0' AS ref,
        |         string_split(trim(text), ' ') AS tk
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, ref, unnest(CASE WHEN len(tk) >= 2 THEN
        |      list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
        |    ELSE []::VARCHAR[] END) AS b
        |  FROM base),
        |c2 AS (SELECT lang, b, count(*) AS c2 FROM bg WHERE ref
        |       GROUP BY lang, b),
        |c1 AS (SELECT lang, split_part(b, ' ', 1) AS w1, sum(c2) AS c1
        |       FROM c2 GROUP BY 1, 2),
        |v AS (SELECT lang, count(DISTINCT t) AS v FROM (
        |        SELECT lang, unnest(tk) AS t FROM base WHERE ref)
        |      GROUP BY lang),
        |dc AS (SELECT doc_id, lang, b, count(*) AS c FROM bg
        |       GROUP BY 1, 2, 3),
        |lp AS (SELECT d.lang, d.b,
        |         CAST(floor(ln(CAST(coalesce(c2.c2, 0) + 1 AS DOUBLE) /
        |                       CAST(coalesce(c1.c1, 0)
        |                            + greatest(coalesce(v.v, 0), 1) AS DOUBLE))
        |                    * 1e6 + 0.5) AS BIGINT) AS lp
        |       FROM (SELECT DISTINCT lang, b FROM dc) d
        |       LEFT JOIN c2 ON d.lang = c2.lang AND d.b = c2.b
        |       LEFT JOIN c1 ON d.lang = c1.lang
        |                   AND split_part(d.b, ' ', 1) = c1.w1
        |       LEFT JOIN v ON d.lang = v.lang),
        |w AS (SELECT dc.doc_id, dc.lang, sum(dc.c) AS n, sum(dc.c * lp.lp) AS s
        |      FROM dc JOIN lp ON dc.lang = lp.lang AND dc.b = lp.b
        |      GROUP BY 1, 2),
        |aw AS (SELECT d.doc_id, d.lang, coalesce(w.n, 0) AS n,
        |              coalesce(w.s, 0) AS s
        |       FROM (SELECT doc_id, lang FROM documents) d
        |       LEFT JOIN w ON d.doc_id = w.doc_id),
        |q AS (SELECT doc_id, lang,
        |        CASE WHEN n = 0 THEN CAST(-1 AS BIGINT)
        |             ELSE CAST(((-s) * 1000) // n AS BIGINT) END AS avg_nll_e9
        |      FROM aw),
        |hist AS (SELECT lang, avg_nll_e9, count(*) AS cnt FROM q
        |         WHERE avg_nll_e9 <> -1 GROUP BY 1, 2),
        |cum AS (SELECT lang, avg_nll_e9,
        |          sum(cnt) OVER (PARTITION BY lang ORDER BY avg_nll_e9) AS cum,
        |          sum(cnt) OVER (PARTITION BY lang) AS tot
        |        FROM hist),
        |cuts AS (SELECT lang,
        |           min(CASE WHEN cum * 10 >= tot * 3 THEN avg_nll_e9 END)
        |             AS q30,
        |           min(CASE WHEN cum * 10 >= tot * 7 THEN avg_nll_e9 END)
        |             AS q70
        |         FROM cum GROUP BY lang)
        |SELECT q.doc_id, q.lang, q.avg_nll_e9,
        |       CASE WHEN q.avg_nll_e9 = -1 THEN 'tail'
        |            WHEN q.avg_nll_e9 <= c.q30 THEN 'head'
        |            WHEN q.avg_nll_e9 <= c.q70 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM q LEFT JOIN cuts c USING (lang)""".stripMargin) { (s, d) =>
      val scored = Corpus.lmScore(Tables.documents(s, d), "doc_id", "text",
        refPred = col("source") === "src0", langCol = Some("lang"))
      Corpus.ccnetBuckets(scored, "doc_id", "lang")
    },

    // Overlapping token-window chunking (64-token chunks, 16-token
    // overlap): one generator explode per doc, all-integer chunk
    // boundaries — the embedding-pipeline pre-pass.
    Q("c6_chunking",
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS tk,
        |         len(string_split(trim(text), ' ')) AS n
        |  FROM documents),
        |c AS (SELECT doc_id, tk,
        |        CASE WHEN n = 0 THEN 0
        |             ELSE greatest(1, CAST(ceil((n - 16) / 48.0) AS INT))
        |             END AS nc
        |      FROM t),
        |ex AS (SELECT doc_id, tk, unnest(range(0, nc)) AS i FROM c)
        |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |       array_to_string(tk[i*48+1 : i*48+64], ' ') AS chunk_text
        |FROM ex""".stripMargin) { (s, d) =>
      Corpus.chunk(Tables.documents(s, d), "doc_id", "text",
        size = 64, overlap = 16)
    })
}
