package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Relational.{t, r2}

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: resampling after a
  * repartition (or on a grown corpus) yields an unrelated subset, so
  * train/eval splits are unreproducible. Content-hash sampling fixes
  * that: a row is in-sample iff `md5(key)` falls below a rate
  * threshold — stable under repartitioning, incremental ingestion and
  * engine changes (any engine with md5 draws the identical sample; the
  * DuckDB oracle replicates it bit-for-bit). This is the standard
  * stable-split trick for 100 TB corpora: no shuffle, no state, a
  * pushdown-friendly filter on a scan.
  */
object Sampling {

  /** First 8 hex chars of md5(key) — a uniform draw from [0, 16^8). */
  def hashDraw(key: Column): Column = substring(md5(key.cast("string")), 1, 8)

  /** Hex threshold for a sampling rate: keep iff hashDraw < threshold.
    * The comparison is plain string ordering on fixed-width lowercase
    * hex — portable across engines with no integer parsing. rate=1.0
    * would format as the 9-char "100000000", which string-compares
    * BELOW most 8-char draws; "g" (> every hex char) is the keep-all
    * threshold that preserves the fixed-width comparison. */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0 && rate <= 1)
    val v = math.floor(rate * (1L << 32)).toLong
    if (v >= (1L << 32)) "g" else f"$v%08x"
  }

  /** Deterministic uniform sample of `rate` by key. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(hashDraw(key) < lit(rateThreshold(rate)))

  /** Deterministic stratified sample: per-stratum rates (e.g. downsample
    * a dominant language while keeping the tail) in a single scan —
    * the when-chain compiles to one codegen'd predicate, no join. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val thr = rates.foldLeft(lit(rateThreshold(defaultRate))) {
      case (acc, (value, rate)) =>
        when(stratum === value, lit(rateThreshold(rate))).otherwise(acc)
    }
    df.filter(hashDraw(key) < thr)
  }

  /** Data-dependent hex threshold (column form of [[rateThreshold]]):
    * keep iff [[hashDraw]] < this. `%08x` renders the same fixed-width
    * lowercase hex in Spark (java.util.Formatter) and DuckDB (printf),
    * so the oracle replicates the comparison bit-for-bit; rate ≥ 1
    * maps to "g" (> every hex char) exactly like the literal path. */
  def rateThresholdCol(rate: Column): Column = {
    // guard on the FLOORED value, exactly like [[rateThreshold]]: a
    // rate one ulp below 1.0 rounds up to 2³² under the multiply, and
    // formatting THAT yields a 9-char "100000000" which breaks the
    // fixed-width string compare — it must render "g" instead
    val v = floor(rate * lit(4294967296.0)).cast("long")
    when(v >= 4294967296L, lit("g")).otherwise(format_string("%08x", v))
  }

  /** Temperature-based mixture sampling over a skewed stratum (lang
    * here): the multilingual-corpus rebalancing rule p_i ∝ n_i^α with
    * α = 0.5, anchored so the LARGEST stratum samples at `baseRate` —
    * i.e. rate_i = min(1, baseRate · sqrt(n_max / n_i)), which
    * upsamples tail strata toward uniform while the head is
    * downsampled hardest. Deterministic end to end: stratum counts →
    * rates is max-anchored (no order-sensitive float summation across
    * strata, so the DuckDB oracle lands on identical doubles — sqrt
    * and the division are correctly-rounded IEEE ops), and membership
    * is the [[hashDraw]] content-hash, stable under repartitioning.
    *
    * At 100 TB: the rate table is |strata|-sized (broadcast), the
    * corpus never shuffles — membership is a codegen'd filter on the
    * scan, same as [[stratifiedHashSample]] but with rates COMPUTED
    * from corpus statistics instead of configured. */
  def temperatureMixStats(s: SparkSession, dir: String,
      baseRate: Double = 0.35): DataFrame = {
    val docs = t(s, dir, "documents")
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(max("n_docs").as("n_max"))))
      .withColumn("rate", least(lit(1.0),
        lit(baseRate) * sqrt(col("n_max").cast("double") / col("n_docs"))))
      .select("lang", "n_docs", "rate")
    val sampled = docs.join(broadcast(rates), "lang")
      .filter(hashDraw(col("doc_id")) < rateThresholdCol(col("rate")))
      .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
    rates.join(sampled, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), Relational.r4(col("rate")).as("rate"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      .orderBy("lang")
  }

  /** Stratified document sample: English (the dominant stratum) at
    * 20%, every other language at 50% — summarized per lang so the
    * oracle check covers both the membership and the aggregate. */
  def sampledDocStats(s: SparkSession, dir: String): DataFrame =
    stratifiedHashSample(t(s, dir, "documents"), col("doc_id"), col("lang"),
      Map("en" -> 0.2), defaultRate = 0.5)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
        r2(sum("n_chars") / count(lit(1))).as("avg_chars"))
      .orderBy("lang")

  /** EXACT-size deterministic sample: the `n` documents with the
    * smallest md5(doc_id) — the fixed-budget eval-set draw that
    * rate-based [[hashSample]] cannot deliver (a rate hits n only in
    * expectation). Same stability contract: the draw order is
    * content-derived, so the same n docs come back under any
    * partitioning, ingestion order, or engine.
    *
    * 100 TB shape: global top-n by a key plans as
    * TakeOrderedAndProject — every partition keeps its local n in a
    * bounded heap and the driver merges partition heads. No global
    * sort, no full shuffle, O(n) driver memory at any corpus size
    * (PlanSpec gates the plan). Growing the corpus only EVICTS drawn
    * docs (new smaller hashes push old ones out), it never reshuffles
    * the survivors' relative order — the eval set evolves by
    * replacement, not churn. */
  def fixedSample(s: SparkSession, dir: String, n: Int = 100): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("draw"))
      .orderBy("draw")
      .limit(n)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        array_join(transform(array_sort(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("doc_ids"))
      .orderBy("lang")

  /** Quality-weighted sampling (p05): each document's keep
    * probability IS its own [[TextAnalysis.qualityScore]] — importance
    * sampling ∝ score, the continuous rung between [[temperatureMixStats]]
    * (one rate per stratum) and `Curation.qualityQuota` (hard top-k):
    * high-quality docs are upweighted smoothly instead of by cliff,
    * the mixing rule quality-aware corpus recipes use. Reports, per
    * lang, the draw's size and the mean quality of sampled vs all —
    * the upweighting made measurable. Reference analog: the
    * filter-chain sampling of streamable/stream.py:230-326 with a
    * content-derived predicate.
    *
    * Scale design: the draw is a pure in-row scan filter — the rate
    * (the doc's own score) and the [[hashDraw]] threshold are both
    * computed in the projection, zero shuffles, zero driver state,
    * and membership is content-derived so re-runs and incremental
    * ingests draw the SAME sample on any engine or partitioning (the
    * p01 stability contract). The only shuffle is the lang-sized
    * report aggregate. Quality means sum r4-scaled integer units
    * (exact recovery of the already-r4-rounded scores), so every
    * float total is order-free integer arithmetic on both engines —
    * the t11 discipline. */
  def qualityWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val qi = floor(col("q") * lit(1e4) + lit(0.5))
    t(s, dir, "documents")
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .withColumn("kept",
        (hashDraw(col("doc_id")) < rateThresholdCol(col("q"))).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("kept").as("n_sampled"),
        Relational.r4(sum(qi).cast("double") / lit(1e4) / count(lit(1)))
          .as("avg_q_all"),
        Relational.r4(sum(when(col("kept") === 1, qi).otherwise(lit(0L)))
          .cast("double") / lit(1e4) / greatest(sum("kept"), lit(1L)))
          .as("avg_q_sampled"))
      .orderBy("lang")
  }

  /** DSIR-style importance scoring (p06; Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling",
    * arXiv:2302.03169): score every document by the log-likelihood
    * RATIO between a target-domain unigram LM and the raw-corpus LM —
    * λ(doc) = Σ_tok ln(p_target(tok)/p_raw(tok)) — so documents that
    * look like the target domain score positive and get upweighted in
    * the resampling draw. The target here is one source feed (conf
    * `graft.dsir.target`, the feed a curator wants more of); both LMs
    * are add-one-smoothed over the corpus top-V vocabulary (conf
    * `graft.dsir.vocab`, sized to this corpus exactly like t11's, so
    * the OOV class stays live in the gate). Emits per (lang, source):
    * doc count, mean per-token log-ratio, and how many docs land in
    * the upweight set — the docs whose score exceeds the CORPUS MEAN
    * score, the relative selection DSIR's top-fraction resampling
    * actually draws from. (An absolute λ > 0 cut would be degenerate
    * here: with Nt ≪ Nr, add-one smoothing gives every UNSEEN token
    * ln((Nr+V+1)/(Nt+V+1)) ≈ +3 nats under the target LM, pushing
    * ~every doc positive — the classic small-target smoothing bias;
    * the relative cut is what makes the signal discriminative.)
    * Reference analog: the score-and-filter chains of
    * streamable/stream.py:230-326, specialized to likelihood-ratio
    * selection.
    *
    * Scale design: TWO token-count shuffles (corpus LM and target LM
    * — the target one is a filtered scan, cost ∝ target feed, not
    * corpus) build |vocab|-row frames; per-token λ is precomputed
    * into a V-entry map and broadcast with the one OOV constant as a
    * single row, so scoring is ONE narrow corpus scan with an in-row
    * map probe per token — no (doc, token) explode, no join on the
    * corpus path (the t11 shape with a two-LM numerator/denominator).
    * The per-doc score frame is ONE materialized ~24-byte/doc row
    * (the c10/t10 asymmetry: checkpoint the narrow projection, never
    * re-walk the text) because the corpus-mean threshold and the
    * final per-(lang, source) aggregate both read it; the mean comes
    * back as a broadcast one-row frame.
    *
    * Cross-engine determinism: λ per token is
    * `ln((ct+1)(Nr+V+1) / ((cr+1)(Nt+V+1)))` — numerator and
    * denominator are built as exact LONG products and `ln` sees ONE
    * double division of exact-integer-valued doubles (the t10/t11
    * precedent), then scaled to integer micronats before any sum, so
    * per-doc and per-group totals are order-free exact integer
    * arithmetic on both engines; even the above-mean cut is integer-
    * exact (dm·n > Σdm — no float mean ever computed). The LONG
    * products hold to ~10¹⁸ token-count mass — beyond any single
    * vocab entry's count at 100 TB (counts cap the product at
    * (c+1)·(N+V+1); re-scale to per-mille smoothing before the
    * 10⁹-docs × 10⁶-tokens regime). */
  def dsirStats(s: SparkSession, dir: String,
      targetSourceParam: String = "", vocabSizeParam: Int = 0): DataFrame = {
    import TextAnalysis.tokens
    val targetSource = if (targetSourceParam.nonEmpty) targetSourceParam
      else s.conf.get("graft.dsir.target", "src0")
    val vocabSize = if (vocabSizeParam > 0) vocabSizeParam
      else s.conf.get("graft.dsir.vocab", "24").toInt
    val vp1 = lit(vocabSize.toLong + 1L)
    val docs = t(s, dir, "documents")
    val cnt = docs.select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cr"))
      .localCheckpoint(eager = false)
    val tcnt = docs.filter(col("source") === targetSource)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("ct"))
    val nrRow = cnt.agg(sum("cr").as("nr"))
    val ntRow = tcnt.agg(coalesce(sum("ct"), lit(0L)).as("nt"))
    val vocab = cnt.orderBy(col("cr").desc, col("tok")).limit(vocabSize)
      .join(tcnt, Seq("tok"), "left")
      .na.fill(0L, Seq("ct"))
    def lamMicro(ct: Column, cr: Column): Column =
      floor(log(((ct + lit(1L)) * (col("nr") + vp1)).cast("double") /
        ((cr + lit(1L)) * (col("nt") + vp1)).cast("double"))
        * lit(1e6) + lit(0.5)).cast("long")
    val lamRow = vocab.crossJoin(broadcast(nrRow)).crossJoin(broadcast(ntRow))
      .withColumn("lam", lamMicro(col("ct"), col("cr")))
      .agg(map_from_entries(collect_list(struct(col("tok"), col("lam"))))
        .as("lmap"))
    val oovRow = nrRow.crossJoin(broadcast(ntRow))
      .select(lamMicro(lit(0L), lit(0L)).as("oov_lam"))
    val stats = lamRow.crossJoin(broadcast(oovRow))
    val toks = tokens(col("text"))
    // dm = the doc's mean per-token log-ratio in integer micronats —
    // the 24-byte/doc projection everything downstream reads
    val perDoc = docs.crossJoin(broadcast(stats))
      .withColumn("lm", aggregate(toks, lit(0L), (acc, tk) =>
        acc + coalesce(try_element_at(col("lmap"), tk), col("oov_lam"))))
      .withColumn("avg_lam",
        col("lm").cast("double") / lit(1e6) / size(toks).cast("long"))
      .select(col("lang"), col("source"),
        floor(col("avg_lam") * lit(1e6) + lit(0.5)).cast("long").as("dm"))
      .localCheckpoint(eager = false)
    val thresholdRow = perDoc.agg(sum("dm").as("tot"),
      count(lit(1)).as("n_corpus"))
    perDoc.crossJoin(broadcast(thresholdRow))
      .withColumn("tl", (col("dm") * col("n_corpus") > col("tot")).cast("long"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        Relational.r4(sum("dm").cast("double") / lit(1e6) / count(lit(1)))
          .as("avg_logratio"),
        sum("tl").as("n_target_like"),
        Relational.r4(sum("tl").cast("double") / count(lit(1)))
          .as("target_like_rate"))
      .orderBy("lang", "source")
  }

  /** Per-stratum exact-k deterministic sample (p07) — exactly `k`
    * docs per source, drawn by content hash: the reproducible
    * "random k per feed" primitive (QA spot-checks, per-source eval
    * slices, UniMax-style per-source caps). Membership is the p04
    * fixed-sample draw (order by md5) applied PER STRATUM, so the
    * draw is stable under repartitioning, ingestion order, and
    * engine swap — and unlike `df.sample`, re-running on a grown
    * corpus preserves previously-drawn rows unless pushed out.
    *
    * Scale design: the per-stratum cut reuses the bounded-heap
    * [[TopKRowsAgg]] kernel (the c05 discipline — O(k)
    * state and shuffle bytes per stratum on BOTH aggregation sides);
    * a per-source window would sort a billion-row stratum to cut at
    * k. Ranking uses the first 13 md5 hex chars as an exact-in-double
    * 52-bit integer; the DuckDB oracle orders by the same fixed-width
    * lowercase hex prefix lexicographically — identical order, ties
    * (coincident 13-char prefixes) broken by doc_id on both sides. */
  def stratifiedFixedSample(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    // r20: native TopKRowsAgg kernel replaces the typed Aggregator —
    // same bounded heap, no row↔object conversion stage (see
    // Similarity.topKPerQuery). Score is the NEGATED draw (the
    // heap keeps highest score first = lowest draw first), exactly
    // the old `Scored(id, -draw.toDouble)`; draws are 52-bit so the
    // long→double negation is exact.
    t(s, dir, "documents")
      .select(col("source"), col("doc_id").cast("long").as("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
          .cast("long").as("draw"))
      .groupBy("source")
      .agg(TopKRows(k, col("doc_id"),
        -(col("draw").cast("double"))).as("tops"))
      .select(col("source"), posexplode(col("tops")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as("doc_id"))
      .orderBy("source", "rnk")
  }

  /** Temperature-mixture epoch plan (p08) — the repeat-factor table a
    * training run is configured from: given the measured per-stratum
    * token masses n_i and the p03 temperature rule w_i ∝ √n_i, split
    * a total training budget of `budgetMult`·Σn_i tokens across
    * strata and report each stratum's allocation and epoch count
    * (allocated / owned — >1 means the stratum repeats, the
    * upsampled tail; <1 means it is subsampled). This is the
    * data-mixture table of the published LLM corpora (Gopher tab. 2,
    * LLaMA tab. 1) computed from the corpus itself; p03 derives
    * sampling RATES from the same rule, this derives the epoch PLAN.
    * Reference analog: streamable's control-parameter derivation
    * chains (stream.py:230-326) — corpus statistics in, plan out.
    *
    * Scale design: one wordcount-shaped partial aggregation to
    * |strata| rows; everything after runs on that tiny frame with the
    * totals broadcast back. The corpus is scanned once, narrow.
    *
    * Cross-engine determinism: √n_i is floored to integer
    * micro-units BEFORE the cross-strata sum (the t11 discipline —
    * irrational weights summed in engine order would drift), so
    * every division sees exact-integer-valued doubles; products stay
    * < 2⁵³ through ~10⁹-token strata. */
  def epochPlan(s: SparkSession, dir: String,
      budgetMult: Int = 2): DataFrame = {
    val counts = t(s, dir, "documents")
      .select(col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
      .withColumn("s6",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long"))
    val totals = counts.agg(sum("s6").as("sw"), sum("n_tokens").as("nc"))
    counts.crossJoin(broadcast(totals))
      .withColumn("weight", Relational.r4(col("s6").cast("double") / col("sw")))
      .withColumn("alloc_tokens",
        floor((lit(budgetMult.toLong) * col("nc") * col("s6")).cast("double") /
          col("sw").cast("double")).cast("long"))
      .withColumn("epochs",
        Relational.r4((lit(budgetMult.toLong) * col("nc") * col("s6")).cast("double") /
          (col("sw") * col("n_tokens")).cast("double")))
      .select("lang", "n_docs", "n_tokens", "weight", "alloc_tokens", "epochs")
      .orderBy("lang")
  }

  /** Importance resampling WITH REPLACEMENT (p09) — the
    * materialization step the sampling family stops short of: p05
    * draws a without-replacement subset, p06 scores target-likeness,
    * p08 allocates a token budget per stratum; this assigns every
    * document its integer REPLICATION COUNT for a quality-weighted
    * epoch of target size K = `factor`·n. mult_i = ⌊K·w_i/W⌋ plus a
    * Bernoulli(frac) residual draw, so Σ E[mult] = K exactly (the
    * systematic-resampling estimator — unbiased, variance far below
    * independent multinomial draws) and high-quality docs repeat
    * while zero-weight docs drop. Reported per lang: doc count,
    * emitted count, max multiplicity, drops. The actual epoch is then
    * `explode(sequence(1, mult))` — a narrow in-row op a caller
    * composes when writing the epoch (the report certifies the plan;
    * materializing 2× the corpus inside the gate would be pure I/O).
    * Reference analog: the weighted re-emission chains of
    * streamable/stream.py:230-326.
    *
    * Scale design: weights, the residual draw, and the multiplicity
    * are ALL in-row column arithmetic over one narrow scan; the only
    * data movement is the one-row (W, n) broadcast back and the
    * |langs|-row report aggregate. Membership is content-derived
    * (md5 of doc_id — the p01 stability contract), so re-runs and
    * incremental ingests replicate identically on any partitioning.
    *
    * Cross-engine determinism: weights are exact r4 integer units
    * (w_i = ⌊q·10⁴+½⌋), base and residual come from LONG `div`/`%`,
    * and the Bernoulli accept compares d·W < rem·2³² as
    * DECIMAL(38,0)/HUGEINT products (exact at any corpus size — the
    * long product overflows past W ≈ 2³¹, i.e. ~10⁵ docs at mean
    * quality, so the wide type is load-bearing, not defensive). */
  def importanceResample(s: SparkSession, dir: String,
      factor: Int = 2): DataFrame = {
    val qi = floor(TextAnalysis.qualityScore(col("text")) * lit(1e4) +
      lit(0.5)).cast("long")
    val per = t(s, dir, "documents")
      .select(col("lang"), col("doc_id"), qi.as("qi"))
      .localCheckpoint(eager = false) // 24-byte/doc frame feeds totals AND multiplicity
    val tot = per.agg(sum("qi").as("w"), count(lit(1)).as("n"))
    val dec = "decimal(38,0)"
    per.crossJoin(broadcast(tot))
      .withColumn("kq", lit(factor.toLong) * col("n") * col("qi"))
      .withColumn("base", expr("kq div w"))
      .withColumn("rem", col("kq") % col("w"))
      .withColumn("d",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("extra", (col("d").cast(dec) * col("w").cast(dec) <
        col("rem").cast(dec) * lit(4294967296L).cast(dec)).cast("long"))
      .withColumn("mult", col("base") + col("extra"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("mult").as("n_emitted"),
        max("mult").as("max_mult"),
        sum((col("mult") === 0L).cast("long")).as("n_dropped"))
      .orderBy("lang")
  }

  /** The k-fold hex cutpoints: fold i covers hashDraw range
    * [cut(i-1), cut(i)) with cut(i) = floor(2³² · i / k) rendered
    * fixed-width — ONE Scala computation feeds the Spark when-chain
    * AND the oracle's CASE literals (the [[rateThreshold]] discipline
    * widened from one threshold to k-1). */
  def kfoldCuts(k: Int): Seq[String] =
    (1 until k).map(i => f"${(1L << 32) * i / k}%08x")

  /** Leakage-free k-fold split (p10): every order lands in its
    * CUSTOMER's fold — the group-level assignment cross-validation
    * needs (splitting raw rows would leak one customer's behavior
    * across train and held-out folds). Fold = which of k equal
    * [[hashDraw]] ranges md5(custkey) falls in, compared as fixed-
    * width hex STRINGS in both engines, so the assignment is
    * reproducible on any engine with md5 and stable under
    * repartitioning. One scan, one shuffle; the emitted per-fold
    * customer/order/revenue figures are the balance evidence. */
  def kfoldStats(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    require(k >= 2)
    val draw = hashDraw(col("o_custkey"))
    val fold = kfoldCuts(k).zipWithIndex.foldRight(lit((k - 1).toLong): Column) {
      case ((cut, i), els) => when(draw < lit(cut), lit(i.toLong)).otherwise(els)
    }
    t(s, dir, "orders")
      .withColumn("fold", fold)
      .groupBy("fold")
      .agg(countDistinct("o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("fold")
  }

  /** Poisson(1) inverse-CDF thresholds as fixed-width hex draws
    * (floor(CDF_k · 2³²), k = 0..5): the bootstrap weight of a row in
    * replica r is how many thresholds its [[hashDraw]]-style draw
    * clears — 0 w.p. e⁻¹, 1 w.p. e⁻¹, …, truncated at 6 (mass beyond
    * ≈ 8·10⁻⁵; both engines truncate identically, so agreement is
    * exact). */
  val poissonCuts: Seq[String] = Seq(
    "5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797", "ff1025f5", "ffd90f3b")

  /** Poisson-bootstrap replica means (p11): the one-pass uncertainty
    * quantification for corpus statistics (Efron's bootstrap in its
    * streaming form — each replica reweights every row by an
    * independent Poisson(1) count instead of resampling n-of-n, the
    * approximation that makes the bootstrap distributable). The
    * spread of the `replicas` means IS the standard error of the
    * corpus mean — the error bar a 100 TB data-quality report should
    * carry and a point estimate cannot provide.
    *
    * Determinism end-to-end: the per-(row, replica) weight derives
    * from md5(orderkey:replica) compared against the [[poissonCuts]]
    * hex literals (the [[rateThreshold]] string-compare discipline),
    * so any engine with md5 draws identical weights — no RNG state,
    * stable under repartitioning. Scale shape: the replica explosion
    * multiplies SCAN-side rows ×R but partial aggregation collapses
    * them to R partial sums per partition before the (tiny, R-row)
    * shuffle — no corpus-sized state anywhere; at very large R swap
    * the explode for an in-row weight ARRAY folded by position
    * (aggregate()), trading codegen'd when-chains for array ops. */
  def bootstrapMeans(s: SparkSession, dir: String,
      replicas: Int = 32): DataFrame = {
    val draw = substring(md5(concat_ws(":",
      col("o_orderkey"), col("r"))), 1, 8)
    val w = poissonCuts.foldLeft(lit(0)) { (acc, cut) =>
      acc + when(draw >= lit(cut), 1).otherwise(0)
    }
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("r", explode(sequence(lit(0), lit(replicas - 1))))
      .withColumn("w", w)
      .groupBy("r")
      .agg(round(sum(col("w") * col("o_totalprice")) / sum("w"), 2)
        .as("boot_mean"),
        sum(col("w")).cast("long").as("boot_n"))
      .orderBy("r")
  }
}
