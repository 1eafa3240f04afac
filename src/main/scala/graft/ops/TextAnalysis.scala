package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Relational.{t, r2, r3, r4}

/** Text analysis for large-scale training-data pipelines: language-ID,
  * quality scoring, token counting, fingerprinting — all as pure
  * column expressions (whole-stage codegen, no UDFs), embarrassingly
  * parallel: a single narrow scan stage at 100 TB, pushdown-friendly.
  */
object TextAnalysis {

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count non-overlapping occurrences of literal `marker` via the
    * length/replace trick — codegen-friendly, replicable in any SQL
    * dialect (the DuckDB oracle uses the identical formula). */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(marker), "")))
      / marker.length).cast("int")

  /** Stopword ratio over a fixed small stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val stops = filter(toks, w => w.isin(stopwords: _*))
    r4(size(stops).cast("double") / greatest(size(toks), lit(1)))
  }

  /** Quality score in [0,1]: rewards reasonable length and penalizes
    * stopword stuffing — a deterministic analog of the heuristic
    * filters used in web-corpus cleaning (C4-style length/symbol
    * rules). */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 100.0, lit(1.0))
    val stopRatio = stopwordRatio(text, Seq("the", "a"))
    r4(lenScore * (lit(1.0) - stopRatio))
  }

  /** Per-(lang, source) token statistics over documents. */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("n_tokens", tokenCount(col("text")))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        r2(sum("n_tokens") / count(lit(1))).as("avg_tokens"),
        max("n_chars").as("max_chars"))
      .orderBy("lang", "source")

  /** Quality scoring aggregated per lang. */
  def qualityByLang(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("q", qualityScore(col("text")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        r4(sum("q") / count(lit(1))).as("avg_quality"),
        r4(min("q")).as("min_quality"),
        r4(max("q")).as("max_quality"))
      .orderBy("lang")

  /** Rule-based language-ID: marker-token votes (an n-gram-profile
    * heuristic à la textcat, reduced to three deterministic marker
    * counts so the DuckDB oracle can replicate it bit-for-bit).
    * Output: claimed lang vs predicted lang confusion counts. */
  def langIdConfusion(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .withColumn("sc_en", occurrences(col("text"), "the"))
      .withColumn("sc_q", occurrences(col("text"), "query"))
      .withColumn("sc_j", occurrences(col("text"), "join"))
    val predicted = when(col("sc_en") >= greatest(col("sc_q"), col("sc_j")), lit("en"))
      .when(col("sc_q") >= col("sc_j"), lit("qq"))
      .otherwise(lit("jj"))
    d.withColumn("predicted", predicted)
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  /** BPE-ish regex tokenization: letter runs / digit runs / punctuation
    * runs (the class split a byte-pair pre-tokenizer makes before
    * merges). Deliberately free of alternation overlap and lookahead
    * so Java regex (Spark) and RE2 (DuckDB oracle) match identically —
    * every position belongs to exactly one class, making
    * leftmost-first ≡ leftmost-longest. The whitespace exclusion is
    * the EXPLICIT RE2 set [\t\n\f\r ], not Java's \s: Java counts
    * U+000B as \s while RE2 does not, so a \s-based class would
    * diverge on vertical tab; with the explicit set both engines put
    * every character in the same class. (The \s+ whitespace SPLIT used
    * for ws-token counts still carries that latent divergence — absent
    * from this corpus — documented rather than hidden.) */
  val bpeTokenPattern: String = "[\\p{L}]+|[\\p{N}]+|[^ \\t\\n\\f\\r\\p{L}\\p{N}]+"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  /** Whitespace vs regex token counts per lang — the two counting
    * regimes a data pipeline budgets with (whitespace for quick stats,
    * subword-ish regex for model-token estimates). The corpus text is
    * pure space-separated words (no digits/punctuation), which would
    * make the regex vacuously equal to the whitespace split — so each
    * doc gets a deterministic marker like " v42.7!" appended, making
    * the class-split logic load-bearing in the oracle hash: a wrong
    * pattern shifts sum_bpe_tokens and fails the compare. */
  def regexTokenStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("marked", concat(col("text"), lit(" v"),
        (col("doc_id") % 100).cast("string"), lit("."),
        (col("n_chars") % 10).cast("string"), lit("!")))
      .withColumn("n_ws", tokenCount(col("marked")))
      .withColumn("n_bpe", bpeTokenCount(col("marked")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_ws").as("sum_ws_tokens"),
        sum("n_bpe").as("sum_bpe_tokens"),
        r2(sum("n_bpe") / sum("n_ws")).as("bpe_per_ws"))
      .orderBy("lang")

  /** Type-token ratio: |distinct tokens| / |tokens| — the C4-style
    * doc-internal repetition signal (boilerplate and generated spam
    * repeat themselves; prose does not). Map-side `array_distinct`
    * like [[Dedup.shingleHashSets]] — no shuffle. */
  def typeTokenRatio(text: Column): Column = {
    val w = tokens(text)
    r4(size(array_distinct(w)).cast("double") / greatest(size(w), lit(1)))
  }

  /** Per-lang repetition profile: mean/min type-token ratio and the
    * count of high-repetition docs (TTR < `threshold`) — the rows a
    * quality-filtering pipeline would drop. */
  def repetitionStats(s: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame =
    t(s, dir, "documents")
      .withColumn("ttr", typeTokenRatio(col("text")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        r4(sum("ttr") / count(lit(1))).as("avg_ttr"),
        r4(min("ttr")).as("min_ttr"),
        count(when(col("ttr") < threshold, 1)).as("n_high_repetition"))
      .orderBy("lang")

  /** Top-k bigram frequencies per language — the vocabulary/frequency
    * profile step of corpus analysis. Counting is one partial-agg
    * shuffle on (lang, bigram) (head bigrams pre-combine map-side, so
    * Zipf skew never concentrates raw rows); ranking is a window over
    * the aggregated counts, whose cardinality is |vocab| not |corpus|.
    */
  def topBigrams(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = t(s, dir, "documents")
    val w = split(lower(trim(col("text"))), "\\s+")
    val bigrams = docs
      .select(col("lang"), w.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("lang"),
        explode(transform(sequence(lit(0), size(col("w")) - 2),
          i => concat_ws(" ", slice(col("w"), i + 1, lit(2))))).as("bigram"))
    val counts = bigrams.groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
    val rankW = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("bigram"))
    counts.withColumn("rnk", row_number().over(rankW).cast("long"))
      .filter(col("rnk") <= k)
      .select("lang", "rnk", "bigram", "n")
      .orderBy("lang", "rnk")
  }

  /** Gopher-style rule filter (Rae et al., "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", Appendix A —
    * the word-level subset that is deterministic over whitespace
    * tokens): a document passes iff
    *
    *  - word count ∈ [minWords, maxWords]           (length rule)
    *  - mean word length ∈ [3, 10]                  (gibberish rule)
    *  - ≥ 2 stopword tokens ('the'/'a' here — the corpus' stopword
    *    inventory; Gopher uses an 8-word list)       (stopword rule)
    *  - ≥ 80% of words contain an alphabetic char   (symbol rule)
    *
    * Per-doc the rules are pure column expressions over ONE tokenize
    * (codegen, no shuffle); the report aggregates failure counts per
    * rule and the pass count per lang — the numbers a curation run
    * reports before dropping. Rules compose with AND, so `n_pass` is
    * NOT n_docs minus the failure columns (a doc can fail several).
    * All comparisons are on integer-derived doubles (sums and counts
    * of lengths), so the DuckDB oracle lands on bit-identical
    * decisions. */
  /** The four per-doc Gopher rule failure flags over `text`, in rule
    * order (words, wordlen, stop, alpha) — ONE definition shared by
    * [[gopherRuleStats]] (t08, the report) and
    * [[qualityClassifierStats]] (t21, the weak-label source), so the
    * label contract and both oracles can never desynchronize. */
  private[ops] def gopherFailCols(text: Column,
      minWords: Int, maxWords: Int): Seq[Column] = {
    val w = tokens(text)
    val nW = size(w).cast("double")
    val meanLen = aggregate(w, lit(0L), (acc, x) => acc + length(x))
      .cast("double") / greatest(size(w), lit(1))
    val nStop = size(filter(w, x => x.isin("the", "a")))
    val alphaRatio = size(filter(w, x => x.rlike("[A-Za-z]")))
      .cast("double") / greatest(size(w), lit(1))
    Seq(nW < minWords || nW > maxWords,
      meanLen < 3.0 || meanLen > 10.0,
      nStop < 2,
      alphaRatio < 0.8)
  }

  def gopherRuleStats(s: SparkSession, dir: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val Seq(failWords, failWordLen, failStop, failAlpha) =
      gopherFailCols(col("text"), minWords, maxWords)
    t(s, dir, "documents")
      .withColumn("f_words", failWords)
      .withColumn("f_wordlen", failWordLen)
      .withColumn("f_stop", failStop)
      .withColumn("f_alpha", failAlpha)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("f_words"), 1)).as("n_fail_words"),
        count(when(col("f_wordlen"), 1)).as("n_fail_wordlen"),
        count(when(col("f_stop"), 1)).as("n_fail_stop"),
        count(when(col("f_alpha"), 1)).as("n_fail_alpha"),
        count(when(!col("f_words") && !col("f_wordlen") &&
          !col("f_stop") && !col("f_alpha"), 1)).as("n_pass"))
      .orderBy("lang")
  }

  /** Zipf-rank lexical commonness: score documents against CORPUS
    * statistics (the perplexity-shaped quality signal, made
    * cross-engine deterministic by ranking instead of log-probability
    * — glibc/JVM `log` are not correctly-rounded, integer ranks are).
    * A top-`v` vocabulary is ranked by (count desc, token asc); every
    * token maps to its rank, out-of-vocabulary tokens to v+1; per-lang
    * mean token rank and OOV ratio summarize lexical commonness
    * (boilerplate scores low, rare-word text high).
    *
    * All sums are LONG (order-independent) with exactly one double
    * division per output column. Scale shape: the vocab build is one
    * token shuffle with map-side combine (the Zipf head pre-combines
    * hard), top-v is a distributed TakeOrdered; the v-row ranking
    * window is single-task BY DESIGN (v is a constant, not corpus
    * data); the rank map broadcasts and scoring is in-row — the
    * corpus is never shuffled or exploded on the scoring path. */
  /** One-row frame holding the top-`v` vocabulary as a token → rank
    * map (rank = row_number over (count desc, token asc); the v-row
    * ranking window is single-task BY DESIGN — v is a constant).
    * Cross-join + broadcast this against the corpus and map tokens
    * with [[tokenIdsCol]]. Shared by [[zipfRankStats]] and
    * [[graft.ops.Curation.packedIdsStats]] so the tie contract and
    * OOV code can never desynchronize between them (both oracles
    * encode it). */
  def vocabRankMap(docs: DataFrame, v: Int): DataFrame = {
    val counts = docs.select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
    val rankW = Window.orderBy(col("n").desc, col("tok"))
    counts.orderBy(col("n").desc, col("tok")).limit(v)
      .withColumn("rnk", row_number().over(rankW))
      .agg(map_from_entries(collect_list(struct(col("tok"), col("rnk")))).as("vm"))
  }

  /** Token-id array over `text`: the token's [[vocabRankMap]] rank, or
    * the OOV code v+1. `vm` is the map column from the cross-joined
    * one-row vocab frame. */
  def tokenIdsCol(text: Column, vm: Column, v: Int): Column =
    transform(tokens(text), x => coalesce(try_element_at(vm, x), lit(v + 1)))

  def zipfRankStats(s: SparkSession, dir: String, v: Int = 30): DataFrame = {
    val docs = t(s, dir, "documents")
    docs.crossJoin(broadcast(vocabRankMap(docs, v)))
      .select(col("lang"),
        tokenIdsCol(col("text"), col("vm"), v).as("ranks"))
      .select(col("lang"),
        aggregate(col("ranks"), lit(0L), (a, r) => a + r).as("sum_rank"),
        size(col("ranks")).cast("long").as("n_tok"),
        size(filter(col("ranks"), r => r === v + 1)).cast("long").as("n_oov"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("total_tokens"),
        r2(sum("sum_rank") / sum("n_tok")).as("avg_rank"),
        r4(sum("n_oov") / sum("n_tok")).as("oov_ratio"))
      .orderBy("lang")
  }

  /** Content fingerprint: md5 of the whitespace-normalized lowercase
    * text — the exact-dedup key for 100 TB corpora (hash once, then
    * dedup on a 32-byte key instead of the full document). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  def fingerprints(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), fingerprint(col("text")).as("fp"),
        col("n_chars"))
      .orderBy("doc_id")

  /** BM25 keyword search: top-`k` documents for a fixed bag of query
    * terms under the standard Okapi BM25 ranking with Lucene's
    * non-negative IDF smoothing, `ln(1 + (N - df + ½)/(df + ½))` —
    * the retrieval scorer every keyword index (Lucene/ES, Tantivy)
    * ships. Reference analog: the corpus `filter`+rank chains of
    * streamable/stream.py:230-326, specialized to ranked retrieval.
    *
    * Scale design: the query terms are a LITERAL list, so per-doc
    * term frequencies are in-row array filters on the one narrow text
    * scan — no explode, no (doc, term) shuffle, no inverted index
    * needed for ad-hoc scoring. The scan's narrow projection
    * (doc_id, len, tf…) is localCheckpointed once because BM25 is
    * inherently two-pass — pass 1 reduces it to ONE global stats row
    * (N, avglen, per-term df; map-side partials, scalar out), pass 2
    * broadcasts that row back over it to score — and the checkpoint
    * (~24 bytes + 8/term per doc) is what keeps the 100 TB text scan
    * single-pass. Final top-k is TakeOrderedAndProject: per-partition
    * bounded heaps, never a global sort. */
  def bm25Search(s: SparkSession, dir: String,
      terms: Seq[String] = Seq("scan", "vector", "hash"), k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = tokens(col("text"))
    val tfCols = terms.indices.map(i =>
      size(filter(toks, x => x === terms(i))).cast("double").as(s"tf$i"))
    val base = t(s, dir, "documents")
      .select(Seq(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
        ++ tfCols: _*)
      .localCheckpoint(eager = false)
    val statAggs =
      Seq(count(lit(1)).cast("double").as("n_docs"),
        avg(col("n_tokens")).as("avg_len")) ++
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("double").as(s"df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val score = terms.indices.map { i =>
      val tf = col(s"tf$i")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5))
      idf * (tf * (k1 + 1)) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * col("n_tokens") / col("avg_len")))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .withColumn("score", r4(score))
      .filter(col("score") > 0)
      .select(col("doc_id"), col("n_tokens"), col("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Unigram-LM cross-entropy scoring (t11) — the CCNet/RedPajama
    * quality signal: train a unigram language model on the corpus
    * itself (top-`vocabSize` tokens by frequency, add-one smoothing
    * with a single OOV class), score every document by its mean
    * per-token cross-entropy `avg(-ln p(tok))`, and report per
    * (lang, source): doc count, mean/min/max cross-entropy, and the
    * OOV rate. Low-CE groups are repetitive/boilerplate-like; high-CE
    * groups are far from the corpus distribution (noise, wrong
    * language) — the two tails CCNet's head/middle/tail split prunes.
    * Reference analog: the corpus filter/score chains of
    * streamable/stream.py:230-326, specialized to LM-based scoring.
    *
    * Scale design: ONE token-count shuffle (map-side combine) builds
    * the LM; top-V is a bounded-heap TakeOrderedAndProject (count
    * desc, token asc — [[vocabRankMap]]'s tie contract); the V-entry
    * (token → count) map plus the scalar N broadcast as one row, so
    * scoring is a single narrow text scan with an in-row map lookup
    * per token — no (doc, token) explode, no second shuffle; the
    * final per-(lang, source) aggregate is map-side partial. The
    * count frame is localCheckpointed once (|vocab| rows — the bm25
    * stats-row asymmetry) because N and the top-V heap both read it.
    *
    * Cross-engine determinism: per-token values are
    * `ln((N+V+1)/(c+1))` — both engines divide identical exact-
    * integer-valued doubles, so `ln` sees identical input (the t10
    * BM25 precedent) — then every floating sum is made order-free by
    * scaling to integer micronats (`floor(v·1e6 + ½)` as LONG) before
    * summing, the decimal-exact-summation discipline of the k-means
    * trainer applied with longs: per-doc and per-group sums are exact
    * integer arithmetic in ANY execution order, on either engine.
    * Long headroom: ~1.2e7 micronats/token × 1e6-token documents =
    * 1.2e13 per doc-sum — five orders below overflow at 100 TB.
    *
    * `vocabSize` 0 (the default) resolves via session conf
    * `graft.unigram.vocab` (the pqTopK dim-via-conf pattern),
    * defaulting to 24 — SIZED TO THIS CORPUS like d12's threshold:
    * the synthetic documents draw from only 31 distinct tokens, so a
    * production-sized vocab (CCNet runs 10⁴–10⁵) would cover every
    * token and leave the OOV class dead in every gate run; at 24 both
    * the in-vocab and OOV paths score real tokens and every group's
    * measured oov_rate is non-trivially between 0 and 1. */
  def unigramCrossEntropy(s: SparkSession, dir: String,
      vocabSizeParam: Int = 0): DataFrame = {
    val vocabSize = if (vocabSizeParam > 0) vocabSizeParam
      else s.conf.get("graft.unigram.vocab", lmVocabDefault.toString).toInt
    val docs = t(s, dir, "documents")
    val cnt = docs.select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val nRow = cnt.agg(sum("c").as("n"))
    val vocabRow = cnt.orderBy(col("c").desc, col("tok")).limit(vocabSize)
      .agg(map_from_entries(collect_list(struct(col("tok"), col("c")))).as("vmap"))
    val stats = nRow.crossJoin(broadcast(vocabRow))
    val toks = tokens(col("text"))
    // ONE vocab-map probe per token: the probe's count feeds both the
    // micronat value and the in-vocab flag from a single struct, so
    // the corpus-wide scoring scan walks each token array once
    val perDoc = docs.crossJoin(broadcast(stats))
      .withColumn("tv", transform(toks, { tk =>
        val c = coalesce(try_element_at(col("vmap"), tk), lit(0L))
        struct(
          floor(log((col("n") + lit(vocabSize.toLong + 1L)).cast("double") /
            (c + lit(1L)).cast("double")) * lit(1e6) + lit(0.5)).as("vs"),
          (c > lit(0L)).cast("long").as("iv"))
      }))
      .withColumn("n_tok", size(col("tv")).cast("long"))
      .withColumn("n_iv",
        aggregate(col("tv"), lit(0L), (acc, x) => acc + x("iv")))
      .withColumn("ce",
        aggregate(col("tv"), lit(0L), (acc, x) => acc + x("vs"))
          .cast("double") / lit(1e6) / col("n_tok"))
    perDoc.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        r3(sum(floor(col("ce") * lit(1e6) + lit(0.5))).cast("double") /
          lit(1e6) / count(lit(1))).as("avg_ce"),
        r3(min(col("ce"))).as("min_ce"),
        r3(max(col("ce"))).as("max_ce"),
        r4(lit(1.0) - sum(col("n_iv")).cast("double") / sum(col("n_tok")))
          .as("oov_rate"))
      .orderBy("lang", "source")
  }

  /** Per-document token-distribution Shannon entropy (t12) — the
    * information-theoretic repetitiveness signal: H = Σ_w (c_w/n)·
    * ln(n/c_w) over each document's own token histogram. Low-entropy
    * documents are template/boilerplate spam (few tokens carrying most
    * of the mass) even when their type-token ratio (t07) looks
    * unremarkable — the two filters catch different degeneracies, so
    * web-corpus cleaning stacks run both. Aggregates per lang: doc
    * count, mean/min/max entropy (nats) and how many docs fall below
    * `lowThreshold` (the prune candidates). Reference analog: the
    * score-and-filter chains of streamable/stream.py:230-326,
    * specialized to an information-theoretic quality score.
    *
    * Scale design: the histogram never leaves the row — no (doc,
    * token) explode, no shuffle before the per-lang aggregate.
    * `array_distinct` gives the types; each type's count is an in-row
    * `filter` scan (types × tokens comparisons per doc — quadratic in
    * the VOCABULARY of one document, bounded by doc length, never by
    * corpus size), so the whole scoring pass is one narrow
    * codegen-friendly scan and the only shuffle is the final ≤
    * |langs|-row partial aggregate.
    *
    * Cross-engine determinism: each type's entropy term is scaled to
    * integer micronats (`floor(v·1e6 + ½)` as LONG — the t11
    * discipline) before the per-doc sum, so the total is exact
    * integer arithmetic in any traversal order: Spark folds the
    * distinct-token array in first-occurrence order, DuckDB groups in
    * hash order, and both land on the identical long. `ln` sees n/c —
    * a division of two exact-integer-valued doubles — so its input is
    * bit-identical on both engines (the t10/t11 precedent). The
    * per-doc double `em/1e6` is exact to 1 ulp on both sides, making
    * the `< lowThreshold` prune flag deterministic. */
  def tokenEntropyStats(s: SparkSession, dir: String,
      lowThreshold: Double = 3.0): DataFrame = {
    val docs = t(s, dir, "documents").withColumn("toks", tokens(col("text")))
    val n = size(col("toks")).cast("double")
    val entMicro = aggregate(array_distinct(col("toks")), lit(0L), (acc, d) => {
      val c = size(filter(col("toks"), x => x === d)).cast("double")
      acc + floor(c * log(n / c) / n * lit(1e6) + lit(0.5)).cast("long")
    })
    docs
      .withColumn("em", entMicro)
      .withColumn("ent", col("em").cast("double") / lit(1e6))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        r3(sum("em").cast("double") / lit(1e6) / count(lit(1))).as("avg_entropy"),
        r3(min(col("ent"))).as("min_entropy"),
        r3(max(col("ent"))).as("max_entropy"),
        sum((col("ent") < lit(lowThreshold)).cast("long")).as("n_low"))
      .orderBy("lang")
  }

  /** Per-document n-gram novelty (t13) — the document-level
    * duplication fraction of Lee et al.'s "Deduplicating Training
    * Data": for each document, what share of its n-token windows
    * (counted WITH multiplicity, one per position) also appears in at
    * least one OTHER document. `novelty = 1 − dup/windows` is the
    * per-doc keep signal a curation pipeline thresholds on; d11 mines
    * the spans themselves, this scores the documents. Within-doc
    * repetition alone does not lower novelty (cross-doc means ≥2
    * DISTINCT docs share the shingle — the d11 contract), so the
    * score is orthogonal to the self-repetition filters t07/t12.
    * Reference analog: the score-and-filter chains of
    * streamable/stream.py:230-326.
    *
    * Scale design (the d11/c12 sketch discipline): span strings never
    * shuffle — each window leaves its row as an 8-byte xxhash64, so
    * every exchange moves 16-byte (doc_id, h) pairs. The window frame
    * is localCheckpointed once and feeds BOTH the repeated-shingle
    * aggregation and the probe side, keeping the 100 TB text scan
    * single-pass. The repeated set (h alone, after a count-distinct-
    * docs ≥ 2 filter) is a small fraction of the corpus and carries
    * no hint — AQE broadcasts it at every measured scale (PlanSpec
    * holds the no-SMJ line). Per-doc totals fall out of the SAME
    * left-join aggregation, so no corpus-sized doc-level join exists
    * anywhere in the plan. */
  def ngramNoveltyStats(s: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val toks = tokens(col("text"))
    val wins = t(s, dir, "documents")
      .select(col("doc_id"), toks.as("w"))
      .where(size(col("w")) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("w")) - n),
        i => xxhash64(concat_ws(" ", slice(col("w"), i + 1, lit(n)))))).as("h"))
      .localCheckpoint(eager = false)
    val rep = wins.distinct()
      .groupBy("h").agg(count(lit(1)).as("nd"))
      .where(col("nd") >= 2).select(col("h").as("rh"))
    wins.join(rep, col("h") === col("rh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        count(col("rh")).as("n_dup"),
        r4(lit(1.0) - count(col("rh")).cast("double") / count(lit(1)))
          .as("novelty"))
      .orderBy("doc_id")
  }

  /** Per-source token-distribution KL divergence vs the corpus (t14)
    * — the domain-shift / outlier-source detector: KL(p_src ‖
    * p_corpus) = Σ_t p_s(t)·ln(p_s(t)/p_g(t)) over unigram
    * distributions. Sources whose language model diverges from the
    * mixture are the ones a data-mixing pass re-weights (the
    * distribution-matching half of DSIR — p06 scores documents
    * against two fixed LMs, this scores SOURCES against the corpus
    * they form). p_s's support is a subset of p_g's by construction
    * (every source token is a corpus token), so no term degenerates.
    *
    * Scale design: one (source, tok) wordcount shuffle with map-side
    * partials is the only corpus-sized exchange; the count frame is
    * localCheckpointed once and derives the global vocabulary, the
    * corpus total and the per-source totals from vocabulary-sized
    * re-aggregations. The term join is counts-vs-vocab on `tok` —
    * hint-free, vocabulary-sized on both sides (never corpus-sized),
    * AQE broadcasts the global side at every measured scale. Totals
    * rows are broadcast scalars.
    *
    * Cross-engine determinism (the t11/t12 micronat discipline,
    * at nano-nat resolution because per-token terms are O(p_s(t))):
    * each term is `floor(p·ln(x)·1e9 + ½)` as LONG before the
    * per-source sum, so accumulation order cannot matter. ln's input
    * `(c·n_g)/(n_s·g)` is one division of two exactly-representable
    * integer-product doubles (products < 2⁵³ through ~10⁹-token
    * builds; beyond that the input drifts ≤1 ulp and the oracle
    * would re-derive at the same width). */
  def sourceKlStats(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cnt = docs.select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val glob = cnt.groupBy("tok").agg(sum("c").as("g"))
    val tot = cnt.agg(sum("c").as("ng"))
    val srcTot = cnt.groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"))
    val nDocs = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val termNano = floor(
      (col("c").cast("double") / col("n_tokens")) *
        log((col("c") * col("ng")).cast("double") /
          (col("n_tokens") * col("g")).cast("double")) * lit(1e9) +
        lit(0.5)).cast("long")
    cnt.join(glob, "tok")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(tot))
      .withColumn("tn", termNano)
      .groupBy("source")
      .agg(first("n_tokens").as("n_tokens"), first("n_types").as("n_types"),
        r4(sum("tn").cast("double") / lit(1e9)).as("kl"))
      .join(broadcast(nDocs), "source")
      .select("source", "n_docs", "n_tokens", "n_types", "kl")
      .orderBy("source")
  }

  /** Count-min sketch certification report (t15) — the frequency
    * sketch missing from the family (MinHash d04, SimHash d05, HLL
    * q24, Bloom c11, t-digest q24, bounded-heap s04 all ship): a
    * depth×width table of hashed token counts whose point estimate
    * min_i cms[i][h_i(tok)] NEVER underestimates the true count and
    * overestimates only on full-row collisions (Cormode & Muthukrishnan
    * 2005). The report compares the sketch estimate against the exact
    * count for every vocabulary token — `over` marks the collision
    * overestimates, and the sketch's one-sided error is the
    * hash-certified table itself (zero `est_n < exact_n` rows, ever).
    * Defaults are sized to THIS corpus the d12/d06 way: vocab 31 at
    * width 32 / depth 2 makes both branches live in every gate run
    * (12 of 31 tokens overestimate at sf0.01 — a width that never
    * collides would leave `over` dead); production sizes width ≈ e/ε
    * and depth ≈ ln(1/δ) for an ε·N error bound at confidence 1−δ.
    *
    * Scale design: the sketch is built as PURE aggregation (the c11
    * Bloom discipline — one melted (row, bucket) shuffle aggregating
    * to ≤ depth×width rows, zero driver actions), which is the whole
    * point at 100 TB: frequency estimates with depth×width state
    * where the exact wordcount needs |vocab|. The exact side and the
    * per-token join exist for the certification REPORT (vocab-sized,
    * fine at the gate corpus; on a production corpus you'd broadcast
    * the tiny sketch frame and estimate in-row without any vocab
    * state). Buckets are md5-derived (conv of the first 8 hex chars,
    * the p03/p07 cross-engine draw convention) so DuckDB replays the
    * sketch bit-for-bit. */
  /** Row `i`'s CMS bucket for a token — md5-derived (the p03/p07
    * cross-engine draw convention), shared by the batch report and
    * the streaming sketch so the two paths cannot desynchronize. */
  private[graft] def cmsBucket(i: Int, width: Int, tok: Column): Column =
    conv(substring(md5(concat(lit(s"cms$i:"), tok)), 1, 8), 16, 10)
      .cast("long") % width

  /** The sketch itself from a `tok` column frame: one melted (row,
    * bucket) aggregation to ≤ depth×width rows. Works unchanged on a
    * STREAMING frame (a running aggregation whose state is bounded by
    * construction — see [[graft.streaming.Streams.cmsStream]]). */
  private[graft] def cmsTable(toks: DataFrame, depth: Int,
      width: Int): DataFrame =
    toks.select(posexplode(array(
        (0 until depth).map(i => cmsBucket(i, width, col("tok"))): _*)))
      .toDF("i", "b")
      .groupBy("i", "b").agg(count(lit(1)).as("cnt"))

  def cmsReport(s: SparkSession, dir: String, depth: Int = 2,
      width: Int = 32): DataFrame = {
    // materialized once: both the sketch build and the exact-count
    // side consume this frame (the repo's multiply-consumed-narrow-
    // frame convention — without it the corpus is re-tokenized twice)
    val toks = t(s, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .localCheckpoint(eager = false)
    def bucket(i: Int): Column = cmsBucket(i, width, col("tok"))
    val cms = cmsTable(toks, depth, width)
    val wc = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
      .select(col("tok") +: col("exact_n") +:
        (0 until depth).map(i => bucket(i).as(s"b$i")): _*)
    // melt the per-token rows back to (i, b) probes; the sketch side
    // is ≤ depth×width rows, so AQE broadcasts it
    wc.select(col("tok"), col("exact_n"),
        posexplode(array((0 until depth).map(i => col(s"b$i")): _*)))
      .toDF("tok", "exact_n", "i", "b")
      .join(cms, Seq("i", "b"))
      .groupBy("tok", "exact_n")
      .agg(min("cnt").as("est_n"))
      .select(col("tok"), col("exact_n"), col("est_n"),
        (col("est_n") > col("exact_n")).cast("long").as("over"))
      .orderBy("tok")
  }

  /** Bigram-LM cross-entropy scoring (t17) — the LM-quality ladder's
    * order-sensitive rung: t11 scores documents against the corpus
    * UNIGRAM distribution (what words appear), this scores them
    * against the corpus BIGRAM transitions (what follows what), so
    * shuffled or grammatically-broken text that fools a unigram model
    * scores high here. Tokens normalize to top-`vocabSize` classes +
    * one OOV symbol (the t11 vocab rule and conf knob); the model is
    * add-one-smoothed p(cur|prev) = (c(prev,cur)+1)/(cx(prev)+V+1)
    * over the V+1 classes; per-doc CE is the mean micronat term over
    * its bigrams. Reported per (lang, source): docs (with ≥1 bigram),
    * mean/min/max CE — the t11 report shape.
    *
    * Scale design: the text is tokenized and class-normalized ONCE
    * into a localCheckpointed per-doc id-array frame; the bigram
    * count table derives from it by ONE in-row-melted aggregation
    * (bounded by (V+1)² classes plus observed combos — vocab-sized,
    * never corpus-sized), comes back as two broadcast maps
    * (bigram → count, context → count), and scoring is a second pass
    * over the SAME checkpointed arrays with two in-row map probes per
    * bigram — no (doc, token) explode on the scoring path, no join.
    *
    * Cross-engine determinism: `ln` sees one division of exact-
    * integer-valued doubles and every term snaps to integer micronats
    * before any sum — the t11 discipline verbatim. The class
    * separator (U+0001) and OOV symbol (U+0002) are outside the
    * corpus alphabet, so the string-keyed bigram map cannot alias. */
  def bigramCrossEntropy(s: SparkSession, dir: String,
      vocabSizeParam: Int = 0): DataFrame = {
    val scored = bigramScoredDocs(s, dir, vocabSizeParam)
      .withColumn("ce",
        col("lm").cast("double") / lit(1e6) / (size(col("ids")) - 1))
    scored.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        r3(sum(floor(col("ce") * lit(1e6) + lit(0.5))).cast("double") /
          lit(1e6) / count(lit(1))).as("avg_ce"),
        r3(min(col("ce"))).as("min_ce"),
        r3(max(col("ce"))).as("max_ce"))
      .orderBy("lang", "source")
  }

  /** The bigram LM's class separator and OOV symbol — both outside
    * the corpus alphabet, so the string-keyed maps cannot alias. */
  private val lmSep = "\u0001"
  private val lmOov = "\u0002"

  /** Token class normalization against the broadcast vocabulary map
    * (top-V kept, everything else the OOV class) — ONE definition
    * for the batch model build/score ([[bigramScoredDocs]]) and the
    * streaming gate ([[graft.streaming.Streams
    * .perplexityGateStream]]), so the two can never tokenize apart. */
  def lmNormIdsCol(text: Column, vmap: Column): Column =
    transform(tokens(text), tk =>
      when(try_element_at(vmap, tk).isNotNull, tk)
        .otherwise(lit(lmOov)))

  private def lmBigramAt(ids: Column, i: Column): Column = concat_ws(lmSep,
    element_at(ids, i + 1), element_at(ids, i + 2))

  /** The persisted LM row projected to SERVE shape: the bigram and
    * context count MAPS become SORTED PARALLEL ARRAYS (bk/bv, xk/xv)
    * for the [[graft.functions.SortedLookup]] bisection, vmap and
    * vp1 ride along unchanged. ONE definition every scoring consumer
    * goes through ([[perplexityGate]], [[bigramScoredDocs]], and via
    * them the streaming gate), evaluated once per broadcast row —
    * never per corpus row.
    *
    * Why: the scoring fold probes bmap once per bigram STEP, and
    * Spark's map probe is a linear scan — bounded here (≤ (V+1)² =
    * 625 entries at the default cap, so the per-4× slope was always
    * fine), but the CONSTANT is ~300 string comparisons per step,
    * and the r18 collect-mode bench rider measured it: c23 6.98 s vs
    * 0.47 s count-shaped at sf0.1 (count() prunes the fold), t17
    * 7.11 s. The bisection is ≤10 comparisons per probe on the same
    * 625 keys. `array_sort(map_entries(m))` orders struct(key, value)
    * by key in UTF8String binary order — the SAME order the kernel
    * compares in. */
  def lmServeCols(model: DataFrame): DataFrame = {
    // ONE named sorted-entry column per map, with keys and values
    // projected FROM it — the sort order that the bisection kernel
    // depends on is written once, so an edit cannot desynchronize
    // bk from bv (the r18 advice; whether the optimizer re-inlines
    // the sort under the projections is costless on this one-row
    // broadcast frame — the named column exists for single-definition
    // safety, not speed)
    model
      .withColumn("bkv", array_sort(map_entries(col("bmap"))))
      .withColumn("xkv", array_sort(map_entries(col("xmap"))))
      .select(col("vmap"), col("vp1"),
        transform(col("bkv"), e => e("key")).as("bk"),
        transform(col("bkv"), e => e("value")).as("bv"),
        transform(col("xkv"), e => e("key")).as("xk"),
        transform(col("xkv"), e => e("value")).as("xv"))
  }

  /** The per-document bigram micronat sum over `ids` given the
    * broadcast SERVE-shape count tables ([[lmServeCols]]) — the
    * t17/c23 scoring fold as ONE column definition batch and stream
    * share (`vp1` = V+1 rides the model row so a serving stream can
    * never smooth against a different vocabulary size than the
    * trainer's). In-row, no shuffle; each probe is a
    * [[graft.functions.SortedLookup]] bisection, an unseen bigram or
    * context legitimately misses to count 0. */
  def lmScoreCol(ids: Column, bk: Column, bv: Column, xk: Column,
      xv: Column, vp1: Column): Column =
    aggregate(sequence(lit(0), size(ids) - 2), lit(0L),
      (acc, i) => {
        val cx = coalesce(
          graft.functions.SortedLookup(xk, xv, element_at(ids, i + 1)),
          lit(0L))
        val cbi = coalesce(
          graft.functions.SortedLookup(bk, bv, lmBigramAt(ids, i)),
          lit(0L))
        acc + floor(log((cx + vp1).cast("double") /
          (cbi + lit(1L)).cast("double")) * lit(1e6) + lit(0.5))
          .cast("long")
      })

  /** Default LM vocabulary size (conf `graft.unigram.vocab` overrides)
    * — ONE definition: [[lmVocabSize]] resolves the Spark side from it
    * and [[graft.SparkEntry]] generates the oracle-SQL `LIMIT`/V+1
    * literals from it (the thresholdGridMicronats pattern), so a
    * default change can never mis-align persisted-vs-retrained
    * certification. SIZED TO THIS CORPUS (31 distinct tokens) so both
    * the in-vocab and OOV-class paths score real tokens every gate
    * run — see [[unigramCrossEntropy]]. */
  val lmVocabDefault = 24

  /** Default micronat threshold of the LM perplexity gate (t17/c23/
    * c22 and the streaming serve path) — ONE definition feeding the
    * Scala default args and the oracle-SQL literals. */
  val perplexityThrDefault = 3200000L

  /** The configured LM vocabulary size — one resolution rule for the
    * trainer, the artifact address, and every consumer. */
  private def lmVocabSize(s: SparkSession, vocabSizeParam: Int): Int =
    if (vocabSizeParam > 0) vocabSizeParam
    else s.conf.get("graft.unigram.vocab", lmVocabDefault.toString).toInt

  /** The trained bigram LM as a first-class ONE-ROW artifact:
    * (vmap: kept-vocabulary membership, bmap: bigram → count, xmap:
    * context → count, vp1: V+1) — everything a serving gate needs to
    * normalize and score exactly as the trainer did, in one
    * broadcastable row (all maps vocab-sized: ≤ (V+1)² + V entries).
    * This is the TRAINING pass (two corpus scans: vocabulary count,
    * bigram count); consumers read the PERSISTED row instead
    * ([[readBigramLmModel]] — the t22 train-once contract), so this
    * lineage is evaluated exactly once per corpus generation, inside
    * [[ensureBigramLmModel]]'s write. */
  def bigramLmModelRow(s: SparkSession, dir: String,
      vocabSizeParam: Int = 0): DataFrame = {
    val vocabSize = lmVocabSize(s, vocabSizeParam)
    val docs = t(s, dir, "documents")
    val cnt = docs.select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    // one tiny row, localCheckpointed: vmap sits both INSIDE the
    // bigram-count lineage and as the final cross-join member —
    // without the cut, each evaluation of the returned row re-runs
    // the tokenize+count vocabulary scan over the corpus
    val vocabRow = cnt.orderBy(col("c").desc, col("tok")).limit(vocabSize)
      .agg(map_from_entries(collect_list(struct(col("tok"), lit(1))))
        .as("vmap"))
      .localCheckpoint(eager = false)
    val nids = docs.crossJoin(broadcast(vocabRow))
      .select(lmNormIdsCol(col("text"), col("vmap")).as("ids"))
      .filter(size(col("ids")) >= 2)
    val cb = nids
      .select(explode(transform(sequence(lit(0), size(col("ids")) - 2),
        i => lmBigramAt(col("ids"), i))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cbi"))
      .localCheckpoint(eager = false)
    val bmapRow = cb.agg(
      map_from_entries(collect_list(struct(col("bg"), col("cbi"))))
        .as("bmap"))
    val xmapRow = cb
      .groupBy(substring_index(col("bg"), lmSep, 1).as("p"))
      .agg(sum("cbi").as("cxx"))
      .agg(map_from_entries(collect_list(struct(col("p"), col("cxx"))))
        .as("xmap"))
    vocabRow.crossJoin(broadcast(bmapRow)).crossJoin(broadcast(xmapRow))
      .withColumn("vp1", lit(vocabSize.toLong + 1L))
  }

  /** Format version of the persisted bigram LM — the
    * [[qualityModelVersion]] contract: the warehouse outlives code,
    * so any semantic change to [[bigramLmModelRow]] (tokenization,
    * class rule, smoothing) must bump this or ensure would serve the
    * old counts while a retraining oracle diverges. */
  val bigramLmVersion = "v1"

  /** Deterministic per-(corpus, vocabSize) location for the persisted
    * bigram LM — the [[qualityModelPath]] addressing contract:
    * format version + every training hyperparameter (a model trained
    * at a different vocabulary size is a DIFFERENT model) + the
    * corpus content stamp (an in-place re-derivation must retrain,
    * not serve counts learned from data that no longer exists). */
  def bigramLmPath(s: SparkSession, dir: String,
      vocabSizeParam: Int = 0): String = {
    val vocabSize = lmVocabSize(s, vocabSizeParam)
    val stamp = Artifacts.contentStamp(s, dir, "documents")
    s"${s.conf.get("spark.sql.warehouse.dir")}/graft_bigram_lm/" +
      s"$bigramLmVersion/${Artifacts.dirTag(dir)}/vs${vocabSize}_st$stamp"
  }

  /** Idempotent train-once for the bigram LM — the
    * [[ensureQualityModel]] contract: without it every new session
    * (and every restart of [[graft.streaming.Streams
    * .perplexityGateStream]]) pays the two-pass training scan. The
    * model is pure longs and map keys (the micronat freeze), so the
    * parquet round-trip is bit-exact — a served score can never
    * drift from a freshly-trained one (OpsSpec pins row equality;
    * t24's oracle retrains in DuckDB against the ARTIFACT-served
    * datasheet). Superseded corpus generations are swept under the
    * [[Artifacts.sweepSuperseded]] retention rule. */
  def ensureBigramLmModel(s: SparkSession, dir: String,
      vocabSizeParam: Int = 0): String = {
    val vocabSize = lmVocabSize(s, vocabSizeParam)
    val path = bigramLmPath(s, dir, vocabSize)
    Artifacts.sweepSuperseded(s, path, s"vs${vocabSize}_st")
    // version-level sweep — the ensureQualityModel bounded-versions
    // contract, symmetric here so a future bigramLmVersion bump
    // cannot strand the old tree
    Artifacts.sweepSuperseded(s,
      s"${s.conf.get("spark.sql.warehouse.dir")}/graft_bigram_lm/" +
        bigramLmVersion, "v")
    Artifacts.ensure(s, path)(
      bigramLmModelRow(s, dir, vocabSize)
        .write.mode("overwrite").parquet(path))
  }

  /** The persisted bigram LM as a one-row frame — ensure then a plain
    * parquet read: consumers broadcast it exactly like the freshly-
    * trained row, but the lineage is one file scan, not a training
    * pass (the [[readQualityModel]] discipline — safe as a streaming
    * static side with no checkpoint ceremony). */
  def readBigramLmModel(s: SparkSession, dir: String,
      vocabSizeParam: Int = 0): DataFrame =
    s.read.parquet(ensureBigramLmModel(s, dir, vocabSizeParam))

  /** Bigram-LM artifact datasheet (t24) — the t22 pattern for the
    * OTHER trained model: the persisted LM described as data
    * (vocabulary size, smoothing constant V+1, distinct
    * bigrams/contexts, total transition mass, the modal bigram's
    * count). The DuckDB oracle RETRAINS the LM from the corpus and
    * must land on the identical row — persisted-vs-retrained
    * certified cross-engine every gate run, closing the loop for the
    * fourth ingest gate's model exactly as t22 closed it for the
    * classifier. One probe of a ONE-ROW frame; the corpus is
    * untouched beyond the (ensure-guarded) training pass. */
  def bigramLmDatasheet(s: SparkSession, dir: String): DataFrame =
    readBigramLmModel(s, dir).select(
      size(col("vmap")).cast("long").as("v"),
      col("vp1"),
      size(col("bmap")).cast("long").as("n_bigrams"),
      size(col("xmap")).cast("long").as("n_contexts"),
      aggregate(map_values(col("xmap")), lit(0L), (a, x) => a + x)
        .as("n_transitions"),
      aggregate(map_values(col("bmap")), lit(0L), (a, x) => greatest(a, x))
        .as("c_max"))

  /** The LM-perplexity GATE as one DataFrame transform — THE single
    * definition of "this document survives the fourth signal",
    * consumed by the batch chain ([[graft.ops.Curation
    * .llmIngestChainStats]]), the streaming serve path
    * ([[graft.streaming.Streams.perplexityGateStream]] delegates
    * here verbatim — stream and batch CANNOT verdict apart), and the
    * composed-stack spec's expectation: normalize against the
    * broadcast model's vmap, drop bigram-less docs (no LM evidence —
    * the conservative c23 default), keep iff the integer fold
    * lm < thrMicronat · n_bigrams. Emits the surviving docs; the
    * model columns never leave.
    *
    * The keep predicate is ONE `exists` over a single-element array
    * so the normalized-id array is a LAMBDA-BOUND VALUE — the
    * let-binding SQL lacks. Phrased as a projected `ids` column that
    * the gate later drops, CollapseProject + filter pushdown INLINE
    * the whole tokenize-normalize expression into the fold's
    * per-step `element_at(ids, i)`, and every fold step re-tokenizes
    * the document — O(tokens²) per doc, measured 92 s vs ~2 s at a
    * ×16 corpus for identical survivors. (c23's report keeps `ids`
    * in its output frame, which blocks the inline — that asymmetry
    * is why only the gate shape hit it.) The `when` guard keeps the
    * fold off bigram-less docs, where its element_at would throw
    * under ANSI. */
  def perplexityGate(docs: DataFrame, lmModel: DataFrame,
      thrMicronat: Long = perplexityThrDefault): DataFrame =
    docs.crossJoin(broadcast(lmServeCols(lmModel)))
      .filter(exists(array(lmNormIdsCol(col("text"), col("vmap"))), idsv =>
        when(size(idsv) >= 2,
          lmScoreCol(idsv, col("bk"), col("bv"), col("xk"), col("xv"),
            col("vp1")) <
            lit(thrMicronat) * (size(idsv) - 1))
          .otherwise(lit(false))))
      .drop("vmap", "bk", "bv", "xk", "xv", "vp1")

  /** The t17 per-document scoring frame — (lang, source, ids, lm)
    * where `ids` is the class-normalized token array and `lm` the
    * document's total bigram micronat sum — SERVED from the
    * persisted LM ([[readBigramLmModel]]): one corpus pass
    * (normalize + in-row fold against the broadcast row), no
    * training on the query path. ONE definition for the t17 report,
    * the c23 gate, and (through the shared [[lmNormIdsCol]]/
    * [[lmScoreCol]] expressions) the streaming gate, so no two
    * consumers can score a document differently. Only documents with
    * ≥ 1 bigram appear (a one-token document has no transition
    * evidence); the size filter precedes the scoring projection
    * because the fold's element_at throws under ANSI past a
    * one-token array. */
  private def bigramScoredDocs(s: SparkSession, dir: String,
      vocabSizeParam: Int = 0): DataFrame =
    t(s, dir, "documents")
      .crossJoin(broadcast(lmServeCols(
        readBigramLmModel(s, dir, vocabSizeParam))))
      .select(col("lang"), col("source"),
        lmNormIdsCol(col("text"), col("vmap")).as("ids"),
        col("bk"), col("bv"), col("xk"), col("xv"), col("vp1"))
      .filter(size(col("ids")) >= 2)
      .withColumn("lm",
        lmScoreCol(col("ids"), col("bk"), col("bv"), col("xk"),
          col("xv"), col("vp1")))
      .select("lang", "source", "ids", "lm")

  /** LM-perplexity quality gate (c23) — the OTHER CCNet signal: t21
    * gates on a trained discriminative classifier, this gates on the
    * corpus bigram LM itself (Wenzek et al. 2020's actual mechanism:
    * keep text the language model finds unsurprising). A document
    * survives iff its mean bigram cross-entropy is below
    * `thrMicronat` micronats/bigram — evaluated as the PURE-INTEGER
    * predicate lm < thr·nb (no float division anywhere near the
    * boundary, so Spark and the oracle cannot disagree on a
    * borderline doc). Documents with no bigram (≤ 1 token) carry no
    * LM evidence and are counted `n_unscored`, not silently kept —
    * the conservative curation default, the t21 ties→fail spirit.
    * Report per (lang, source): total docs, scored, kept, surviving
    * token mass, floor-div milli keep rate (of scored).
    *
    * Plan shape: the shared [[bigramScoredDocs]] pass (tokenize
    * once, vocab-sized broadcast maps, in-row fold) + one
    * languages-wide rollup + a tiny all-docs count join. The corpus
    * never shuffles to be gated. Reference analog: `filter(when=)`
    * with a scoring callable (streamable/stream.py:230-276). */
  def perplexityGateStats(s: SparkSession, dir: String,
      thrMicronat: Long = perplexityThrDefault,
      vocabSizeParam: Int = 0): DataFrame = {
    val scored = bigramScoredDocs(s, dir, vocabSizeParam)
      .withColumn("n_tok", size(col("ids")).cast("long"))
      .withColumn("nb", col("n_tok") - 1L)
      .withColumn("keep",
        (col("lm") < lit(thrMicronat) * col("nb")).cast("long"))
    val g = scored.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_scored"),
        sum("keep").as("n_kept"),
        sum(col("keep") * col("n_tok")).as("kept_tokens"))
    t(s, dir, "documents").groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"))
      .join(g, Seq("lang", "source"), "left")
      .select(col("lang"), col("source"), col("n_docs"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        (col("n_docs") - coalesce(col("n_scored"), lit(0L))).as("n_unscored"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        floor(coalesce(col("n_kept"), lit(0L)) * lit(1000L) /
          greatest(coalesce(col("n_scored"), lit(0L)), lit(1L)))
          .cast("long").as("keep_rate_milli"))
      .orderBy("lang", "source")
  }

  /** Corpus TF-IDF top terms per document (t16) — the keyword-
    * extraction staple (salience = raw tf × ln(N/df)) and the
    * per-document dual of t10's per-query BM25: t10 ranks documents
    * for one query, this surfaces each document's own most
    * characteristic terms (the metadata a retrieval/labeling pipeline
    * attaches at ingest). Reference analog: the score-and-map chains
    * of streamable/stream.py:230-326.
    *
    * Scale design: ONE tokenize pass — the (doc_id, tok, tf) frame is
    * localCheckpointed and feeds BOTH its own df aggregation and the
    * scoring probe, so 100 TB of text is scanned once. The df frame
    * is vocab-sized and joins unhinted (AQE broadcasts it at gate
    * scale; a web-scale vocab degrades to a hash shuffle on the
    * 16-byte (tok, df) pairs — text never travels). N arrives as a
    * broadcast one-row cross join, the e13/t11 discipline. Top-k per
    * doc is a doc_id-partitioned row_number — key-parallel, no global
    * sort.
    *
    * Cross-engine determinism: idf snaps to integer micronats
    * (`floor(ln(N/df)·1e6 + ½)` as LONG — the t11 discipline) before
    * the tf multiply, so scores are exact integer micro-units and the
    * (score desc, tok) rank has no float boundary; the reported
    * double re-derives from the integer on both engines. */
  def tfidfTopTerms(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = t(s, dir, "documents")
    val tk = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val dfr = tk.groupBy("tok").agg(count(lit(1)).as("df"))
    val nRow = docs.agg(count(lit(1)).as("n_corpus"))
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("sm").desc, col("tok"))
    tk.join(dfr, "tok")
      .crossJoin(broadcast(nRow))
      .withColumn("sm", col("tf") *
        floor(log(col("n_corpus").cast("double") / col("df").cast("double"))
          * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("rnk", row_number().over(byDoc).cast("long"))
      .where(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("tok"),
        r4(col("sm").cast("double") / lit(1e6)).as("score"))
      .orderBy("doc_id", "rnk")
  }

  /** BPE merge-pair training (t18) — the tokenizer-TRAINING rung the
    * t-family lacked: `rounds` iterations of count-adjacent-symbol-
    * pairs → merge-the-top-pair (Sennrich et al. 2016, "Neural
    * Machine Translation of Rare Words with Subword Units"), the
    * counts → merges → vocab stage of standard corpus prep whose
    * OUTPUT upgrades [[bpeTokenCount]]'s fixed BPE-ish regex (t07's
    * consumer) to a corpus-fitted merge table. Declarative end to
    * end, the s06 unrolled-Lloyd discipline applied to pair counts:
    *
    *  - The corpus collapses ONCE to the distinct-word frequency
    *    table (heavy-hitter compression: all later rounds cost
    *    ∝ vocabulary, not corpus — at 100 TB the only full-corpus
    *    pass is the initial word count's shuffle).
    *  - Per round: adjacent pairs via one in-row `zip_with` of the
    *    symbol array against its own shift + `explode`, freq-weighted
    *    count (map-side combine onto the tiny pair space), and the
    *    top pair under the TOTAL order (count desc, left, right — no
    *    float, no tie ambiguity) kept as a ONE-ROW `limit(1)` frame.
    *  - The merge applies as a broadcast of that one-row frame into
    *    an `aggregate` fold over each word's symbols — greedy
    *    left-to-right non-overlapping, the classic semantics: a
    *    freshly merged token never re-merges in its own round
    *    (`l ++ r` is strictly longer than `l`, so the fold's
    *    last-element check cannot re-fire). No driver-side collect
    *    anywhere: merge literals reach the lambda as OUTER COLUMN
    *    references from the broadcast join, and the result table is
    *    the union of the per-round one-row frames.
    *  - Per-round `localCheckpoint` cuts the iterated lineage (the
    *    [[graft.ops.Similarity.kmeansCodebook]] /
    *    [[graft.ops.Dedup.connectedComponents]] discipline).
    *
    * Precondition: the corpus must have ≥ `rounds` distinct adjacent
    * pairs available (an exhausted-pairs round would broadcast an
    * empty frame); every gate corpus is orders of magnitude past it.
    * The DuckDB oracle replays the rounds as generated CTE stages
    * with the merge as a POSITION-SKIPPING recursive walk — a
    * structurally different formulation of the same greedy contract.
    * Reference analog: the reference has no trained tokenizer
    * (streamable/stream.py's map chains transform elements one at a
    * time); this is extension surface, cited per the survey
    * discipline. */
  def bpeMerges(s: SparkSession, dir: String, rounds: Int = 6): DataFrame =
    bpeTrain(s, dir, rounds)._1

  /** BPE tokenizer artifact FORMAT VERSION — the
    * [[qualityModelVersion]] discipline for the trained merge table:
    * any semantic change to [[trainBpeFrames]] (word extraction,
    * pair counting, the greedy fold, tie contract) must bump it or
    * ensure would serve segmentations trained by code that no longer
    * exists while four retraining oracles diverge. */
  val bpeModelVersion = "v1"

  /** Deterministic address of the persisted BPE model — rounds +
    * format version + the documents table's content stamp (the
    * [[qualityModelPath]] contract). */
  def bpeModelPath(s: SparkSession, dir: String, rounds: Int): String = {
    val stamp = Artifacts.contentStamp(s, dir, "documents")
    s"${s.conf.get("spark.sql.warehouse.dir")}/graft_bpe_model/" +
      s"$bpeModelVersion/${Artifacts.dirTag(dir)}/r${rounds}_st$stamp"
  }

  /** Idempotent train-once for the BPE tokenizer — the LAST
    * session-scoped trained artifact in the engine, retired with the
    * [[graft.ops.Similarity.ensureCodebook]] discipline (r19): the
    * merge table and segmented vocabulary that EVERY tokenize
    * consumes (t18 publishes, t19/c20/c22 apply, the streaming BPE
    * gates serve) used to be memoized per session, so each new
    * driver paid `rounds` corpus-vocabulary training passes before
    * its first encode. Now: _SUCCESS-guarded build at a stamped
    * address — merges and vocab under one root, the vocab (written
    * LAST) carrying the marker so a crash between the two writes
    * leaves no marker and the next call rebuilds (the
    * `ensureSemanticIndex` pair contract). Both frames are pure
    * strings + longs, so the parquet round-trip is bit-exact, and
    * the four existing retraining oracles (t18/t19/c20/c22) become
    * persisted-vs-retrained certifications on every gate run. */
  def ensureBpeModel(s: SparkSession, dir: String,
      rounds: Int = 6): String = {
    require(rounds >= 1)
    val root = bpeModelPath(s, dir, rounds)
    Artifacts.sweepSuperseded(s, root, s"r${rounds}_st")
    Artifacts.sweepSuperseded(s,
      s"${s.conf.get("spark.sql.warehouse.dir")}/graft_bpe_model/" +
        bpeModelVersion, "v")
    val marker = new org.apache.hadoop.fs.Path(s"$root/vocab/_SUCCESS")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      val (merges, vocab) = trainBpeFrames(s, dir, rounds)
      merges.write.mode("overwrite").parquet(s"$root/merges")
      vocab.write.mode("overwrite").parquet(s"$root/vocab")
    }
    root
  }

  /** The trained-BPE SERVE path shared by [[bpeMerges]] (publishes
    * the merge table) and [[bpeEncodeStats]] (applies the final
    * segmentation) — a read of the persisted [[ensureBpeModel]]
    * pair. Returns (merge table (merge_round, left_sym, right_sym,
    * pair_count), final segmented vocabulary (word, freq, syms)),
    * both vocabulary-sized (KBs), corpus-size-independent; the
    * lineage of each is one file scan, so a fresh driver runs zero
    * training jobs against a populated warehouse (WarmStartSpec). */
  private[ops] def bpeTrain(s: SparkSession, dir: String,
      rounds: Int): (DataFrame, DataFrame) = {
    val root = ensureBpeModel(s, dir, rounds)
    (s.read.parquet(s"$root/merges").orderBy("merge_round"),
      s.read.parquet(s"$root/vocab"))
  }

  /** The BPE TRAINING pass — [[ensureBpeModel]]'s build lambda,
    * separately callable so OpsSpec can certify persisted ≡
    * retrained row equality every suite run. */
  private[ops] def trainBpeFrames(s: SparkSession, dir: String,
      rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1)
    val docs = t(s, dir, "documents")
    var words = docs
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        regexp_extract_all(col("word"), lit("."), lit(0)).as("syms"))
      .localCheckpoint()
    var merged: Seq[DataFrame] = Nil
    (1 to rounds).foreach { r =>
      val top1 = words
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
        .agg(sum("freq").as("pair_count"))
        .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
        .limit(1)
        .localCheckpoint()
      merged = merged :+ top1.select(lit(r.toLong).as("merge_round"),
        col("left_sym"), col("right_sym"), col("pair_count"))
      words = words.crossJoin(broadcast(top1))
        .withColumn("syms",
          mergeFold(col("syms"), col("left_sym"), col("right_sym")))
        .drop("left_sym", "right_sym", "pair_count")
        .localCheckpoint()
    }
    (merged.reduce(_ unionByName _).orderBy("merge_round"), words)
  }

  /** The trained merge table as a broadcastable ONE-ROW frame
    * (ml/mr: left/right symbol arrays in round order) — the
    * serve-side artifact [[bpeApplyCol]] folds against. Order is
    * restored via `array_sort(collect_list(struct(round, …)))`, not
    * an orderBy-then-agg (whose ordering an aggregation does not
    * guarantee). */
  def bpeMergeRow(s: SparkSession, dir: String, rounds: Int = 6): DataFrame =
    bpeTrain(s, dir, rounds)._1
      .agg(array_sort(collect_list(struct(col("merge_round"),
        col("left_sym"), col("right_sym")))).as("m"))
      .select(
        transform(col("m"), x => x.getField("left_sym")).as("ml"),
        transform(col("m"), x => x.getField("right_sym")).as("mr"))

  /** Segment ANY word — including words the training corpus never
    * saw — by replaying the trained merge table: round r's greedy
    * left-to-right merge fold is the IDENTICAL `aggregate` lambda
    * the trainer itself applies ([[bpeTrain]]), so on corpus words
    * this reproduces the training segmentation exactly, and on
    * unseen words it extends it (unseen characters simply never
    * merge). Contract note: this is the SEQUENTIAL-ROUND replay —
    * the training-side segmentation t19/c20 are certified against —
    * not a priority-queue re-encode, which can differ on words
    * where an early pair only becomes adjacent after a later merge
    * creates its right symbol. `ml`/`mr` are [[bpeMergeRow]]
    * columns; `rounds` must match the table length. */
  def bpeApplyCol(word: Column, ml: Column, mr: Column,
      rounds: Int): Column =
    (1 to rounds).foldLeft(regexp_extract_all(word, lit("."), lit(0))) {
      (syms, r) =>
        mergeFold(syms, element_at(ml, r), element_at(mr, r))
    }

  /** ONE greedy left-to-right merge pass of the pair (l, r) over a
    * symbol array — THE merge fold, a single definition shared by
    * the trainer ([[bpeTrain]]'s per-round re-segmentation) and the
    * serve path ([[bpeApplyCol]]), so the two can never drift. */
  private[graft] def mergeFold(syms: Column, l: Column, r: Column): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === l && x === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(concat(l, r))))
        .otherwise(concat(acc, array(x))))

  /** BPE encode (t19) — the trained tokenizer APPLIED, closing the
    * counts → merges → vocab → SEGMENT loop: every corpus word is
    * segmented by the [[bpeTrain]] vocabulary and the report gives
    * per-lang subword statistics — token count, subword count,
    * milli-subwords-per-word (the compression ratio a tokenizer is
    * judged on) and the effective subword vocabulary each lang
    * touches. The corpus pays ONE tokenize + one (lang, word) count
    * shuffle; the segmented vocabulary joins in as a BROADCAST
    * (vocabulary-sized — at 100 TB the corpus never reshuffles for
    * the tokenizer) and subword explosion happens on the counted
    * (lang, word) table, not per occurrence. Integer-only outputs
    * (floor-div milli ratio), so cross-engine equality is exact.
    * Reference analog: the map-then-aggregate consumption idiom of
    * the reference's chained transforms (streamable/stream.py:230-
    * 326); tokenizer application itself is extension surface. */
  def bpeEncodeStats(s: SparkSession, dir: String,
      rounds: Int = 6): DataFrame = {
    val segs = bpeTrain(s, dir, rounds)._2
    val docs = t(s, dir, "documents")
    val occ = docs
      .select(col("lang"), explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("n"))
    val seg = occ.join(broadcast(segs.select(col("word"), col("syms"))), "word")
      .localCheckpoint(eager = false) // two consumers below; vocab-sized × langs
    val base = seg.groupBy("lang").agg(
      sum(col("n")).as("n_words"),
      sum(col("n") * size(col("syms"))).as("n_subwords"))
    val vocab = seg.select(col("lang"), explode(col("syms")).as("subword"))
      .groupBy("lang").agg(countDistinct("subword").as("n_vocab"))
    base.join(vocab, "lang")
      .select(col("lang"), col("n_words"), col("n_subwords"),
        // integer-derived doubles: the product stays far below 2^53,
        // so floor(double quotient) == floor-div on both engines (the
        // l01 oracle discipline)
        floor(col("n_subwords") * lit(1000L) / col("n_words"))
          .cast("long").as("spw_milli"),
        col("n_vocab"))
      .orderBy("lang")
  }

  /** Heaps'-law vocabulary-growth curve (t20): distinct-word count as
    * the corpus grows through four nested md5-sliced snapshots (25%,
    * 50%, 75%, 100% of documents) — the measurement behind "how big
    * does the vocab get at 10× the data?", the sizing input for
    * tokenizer vocab budgets ([[bpeMerges]]) and dedup shingle
    * universes. The naive formulation re-scans the corpus once PER
    * SNAPSHOT (k× for a k-point curve); here no aggregation depends
    * on the snapshot count: each document draws its slice via the
    * [[graft.ops.Sampling.hashDraw]] md5-threshold discipline
    * (engine-independent by string comparison), each WORD keeps the
    * MINIMUM slice it appears in (one shuffle on word — nested
    * snapshots mean first-appearance determines membership in every
    * later snapshot), and the cumulative curve is a running sum over
    * the FOUR-row aggregated frame. Integer counts only.
    * Reference analog: the reference's `distinct()` is the one-
    * snapshot special case (streamable/stream.py:279-287); the
    * growth CURVE across nested snapshots is extension surface. */
  def heapsLawCurve(s: SparkSession, dir: String): DataFrame = {
    val draw = Sampling.hashDraw(col("doc_id"))
    val slice = (lit(1L) +
      (draw >= lit(Sampling.rateThreshold(0.25))).cast("long") +
      (draw >= lit(Sampling.rateThreshold(0.5))).cast("long") +
      (draw >= lit(Sampling.rateThreshold(0.75))).cast("long")).as("slice")
    val docs = t(s, dir, "documents").select(slice, col("text"))
    val toks = docs.select(col("slice"),
      explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("word"))
    val firstSeen = toks.groupBy("word").agg(min("slice").as("s0"))
      .groupBy("s0").agg(count(lit(1)).as("nv"))
    // LEFT join: a snapshot where no word first-appears (tiny vocab
    // saturating at 25% — this corpus does exactly that) contributes
    // nv = 0, it does not vanish from the curve
    val perSlice = docs.groupBy("slice")
      .agg(count(lit(1)).as("nd"))
      .join(toks.groupBy("slice").agg(count(lit(1)).as("nt")), "slice")
      .join(firstSeen.withColumnRenamed("s0", "slice"), Seq("slice"), "left")
    // four aggregated rows — the running frame is over an Aggregate
    // that dominates every leaf (the sanctioned unpartitioned-window
    // shape)
    val cum = Window.orderBy("slice")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perSlice.select(col("slice"),
      sum("nd").over(cum).as("n_docs"),
      sum("nt").over(cum).as("n_tokens"),
      sum(coalesce(col("nv"), lit(0L))).over(cum).as("n_vocab"))
      .orderBy("slice")
  }

  /** floor(ln(x)·1e6 + ½) as LONG — the t11 integer-micronat
    * discipline: every log a trained model carries is frozen to an
    * integer BEFORE any summation, so totals are exact long
    * arithmetic in any traversal order on any engine; `ln` itself
    * only ever sees a correctly-rounded double ratio of exact
    * integers (identical bits on both engines — the t10/t11
    * precedent). */
  private def microLn(x: Column): Column =
    floor(log(x) * lit(1e6) + lit(0.5)).cast("long")

  /** Model-based quality classifier (t21) — the CCNet/fastText-style
    * curation stage: train a Naive Bayes text classifier on WEAK
    * labels (the t08 Gopher rule verdict, via the shared
    * [[gopherFailCols]] definition — self-contained, no human
    * labels), then score every document with the TRAINED model and
    * report where model and rules diverge. The rules see only
    * length/stopword/alpha shape; the model sees token IDENTITY, so
    * it generalizes the rules' verdict onto vocabulary — the
    * `n_disagree` column is the live proof it learned a different
    * (lexical) decision boundary, not a re-encoding of the rules.
    *
    * Training is one token shuffle: explode → per-token
    * (pass-class count, fail-class count) with map-side combine;
    * totals and the doc-count prior are two scalar rows. Per-token
    * log-odds weights use add-one smoothing over the vocabulary + an
    * explicit OOV outcome, every logarithm frozen to integer
    * micronats ([[microLn]]) the moment it is computed — the trained
    * model is pure longs, so Spark and the DuckDB oracle land on
    * bit-identical weights, scores, and verdicts.
    *
    * Scoring is in-row: the weight map rides a broadcast ONE-ROW
    * frame BOUNDED at [[classifierVocabSize]] entries — the model
    * vocabulary is CAPPED at the top-N tokens by total occurrence,
    * with all below-cap mass trained into the single OOV outcome
    * (the c23 top-24+OOV discipline). The cap is what makes this a
    * 100 TB design: Spark's map probe is a linear scan, so an
    * uncapped (corpus-vocabulary-sized, Heaps'-law-growing) map made
    * scoring O(tokens · V) — measured 6.41× per 4× at ×64 before the
    * cap. Each document folds its own token array once:
    * score = prior + Σ w(tok), predict pass iff score > 0 (ties →
    * fail, the conservative curation default). The corpus is never
    * shuffled on the scoring path.
    *
    * Precondition: both weak classes must be non-empty (a one-class
    * corpus has no trainable signal). Spark's `log` returns NULL on
    * non-positive input — a bare ln(0) prior would silently
    * NULL-propagate into every score and verdict (zero docs kept, a
    * gate that drops everything without a word) — so the guard is a
    * `raise_error` INSIDE the consumed prior column (the quant16
    * discipline: Catalyst cannot prune it), pinned by the OpsSpec
    * one-class test. Reference analog: arbitrary
    * scoring callables inside `map` chains
    * (streamable/stream.py:372-392); the trained-model member is
    * extension surface. */
  def qualityClassifierStats(s: SparkSession, dir: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val fails = gopherFailCols(col("text"), minWords, maxWords)
    val docsY = t(s, dir, "documents")
      .withColumn("y", (!fails.reduce(_ || _)).cast("long"))
    // SERVED from the persisted artifact (the c22/streaming path —
    // t22 certifies persisted ≡ retrained bit-equality every gate
    // run, so the report cannot differ from an inline retrain; the
    // training pass runs once per corpus generation inside ensure)
    docsY.crossJoin(broadcast(readQualityModel(s, dir, minWords, maxWords)))
      .withColumn("score",
        classifierScoreCol(col("text"), col("wm"), col("w_oov"), col("prior")))
      .withColumn("pred", (col("score") > 0L).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("y").as("n_weak_pass"),
        sum("pred").as("n_pred_pass"),
        sum((col("pred") =!= col("y")).cast("long")).as("n_disagree"))
      .orderBy("lang")
  }

  /** The trained t21 model as a first-class ARTIFACT: one row of
    * (wm: token → micronat log-odds, w_oov, prior) — train once,
    * score anywhere ([[qualityClassifierStats]] reports on it,
    * [[graft.ops.Curation.classifierFilteredStats]] filters with it,
    * [[graft.streaming.Streams.qualityGateStream]] serves it against
    * an unbounded stream). Pure longs (the [[microLn]] freeze), so
    * any consumer on any engine scores identically. Long-lived
    * consumers should `localCheckpoint`/persist the row — the
    * semanticIndex discipline: a streaming static side re-evaluates
    * per micro-batch, and this frame's lineage is a full training
    * pass. See [[qualityClassifierStats]] for the full training
    * contract. */
  /** Default classifier vocabulary cap (conf `graft.classifier.vocab`
    * overrides) — ONE definition: [[classifierVocabSize]] resolves the
    * Spark side from it and [[graft.SparkEntry]] generates the oracle
    * `LIMIT` literal from it, so the six dependent oracles (t21, t22,
    * t23, c21, c22 + the streaming gate's batch twin) can never cap
    * apart from the trainer. SIZED TO THIS CORPUS like
    * [[lmVocabDefault]]: 31 distinct whitespace tokens, so at 24 both
    * the in-cap and trained-OOV scoring paths carry real mass every
    * gate run. */
  val classifierVocabDefault = 24

  /** The configured t21 vocabulary cap — one resolution rule for the
    * trainer, the artifact address, and every consumer (the
    * [[lmVocabSize]] contract). */
  def classifierVocabSize(s: SparkSession): Int =
    s.conf.get("graft.classifier.vocab", classifierVocabDefault.toString)
      .toInt

  def trainQualityModel(s: SparkSession, dir: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val cap = classifierVocabSize(s)
    val fails = gopherFailCols(col("text"), minWords, maxWords)
    val docsY = t(s, dir, "documents")
      .withColumn("y", (!fails.reduce(_ || _)).cast("long"))
    // per-token class-conditional counts: ONE token shuffle serves
    // both classes (cp = pass-class occurrences, cf = fail-class)
    val cnt = docsY
      .select(col("y"), explode(tokens(col("text"))).as("tok"))
      .groupBy("tok")
      .agg(sum(col("y")).as("cp"), sum(lit(1L) - col("y")).as("cf"))
      .localCheckpoint(eager = false) // consumed thrice: totals + cap head + weights
    // the vocabulary CAP: only the top-`cap` tokens by total
    // occurrence (count desc, token asc — the vocabRankMap tie
    // contract) carry their own weight; everything below the cap is
    // ONE trained OOV outcome whose counts are the leftover class
    // mass. This bounds the served weight map at `cap` entries no
    // matter how the corpus vocabulary grows (Heaps' law: V ~ n^β) —
    // the map probe inside [[classifierScoreCol]] is a linear scan,
    // so an uncapped map made scoring O(tokens · V), measured 6.41×
    // per 4× at a ×64 corpus. TakeOrdered on the checkpointed count
    // frame: deterministic (tok is unique), bounded-heap, re-derived
    // cheaply by both consumers below.
    val capped = cnt
      .orderBy((col("cp") + col("cf")).desc, col("tok")).limit(cap)
    val tot = cnt.agg(sum("cp").as("npa"), sum("cf").as("nfa"))
      .crossJoin(broadcast(capped.agg(
        coalesce(sum("cp"), lit(0L)).as("npi"),
        coalesce(sum("cf"), lit(0L)).as("nfi"),
        count(lit(1)).as("v"))))
      .select(col("npa").as("np"), col("nfa").as("nf"), col("v"),
        (col("npa") - col("npi")).as("cpo"),
        (col("nfa") - col("nfi")).as("cfo"))
    val pri = docsY.agg(sum("y").as("ndp"), sum(lit(1L) - col("y")).as("ndf"))
    // add-one smoothing over v in-cap tokens + 1 OOV outcome; each
    // class log-prob frozen to micronats independently, weight =
    // difference. Degenerate check: cap ≥ V makes cpo = cfo = 0 and
    // this reproduces the uncapped model bit-for-bit.
    val wRows = capped.crossJoin(broadcast(tot)).select(col("tok"),
      (microLn((col("cp") + 1L).cast("double") /
          (col("np") + col("v") + 1L).cast("double")) -
        microLn((col("cf") + 1L).cast("double") /
          (col("nf") + col("v") + 1L).cast("double"))).as("wt"))
    wRows
      .agg(map_from_entries(collect_list(struct(col("tok"), col("wt"))))
        .as("wm"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(pri))
      .select(col("wm"),
        (microLn((col("cpo") + 1L).cast("double") /
            (col("np") + col("v") + 1L).cast("double")) -
          microLn((col("cfo") + 1L).cast("double") /
            (col("nf") + col("v") + 1L).cast("double")))
          .as("w_oov"),
        when(col("ndp") > 0L && col("ndf") > 0L,
          microLn(col("ndp").cast("double")) -
            microLn(col("ndf").cast("double")))
          .otherwise(raise_error(format_string(
            "trainQualityModel: weak labels are one-class " +
              "(pass=%s docs, fail=%s docs) — no trainable signal; " +
              "widen the corpus or relax the Gopher bounds",
            col("ndp").cast("string"), col("ndf").cast("string")))
            .cast("long"))
          .as("prior"))
  }

  /** The t21 classifier's micronat threshold grid for [[
    * classifierThresholdCurve]]: ±1, ±2, ±5 nats around the c21
    * operating point 0, frozen here so Spark and the oracle can
    * never grid differently. */
  val thresholdGridMicronats: Seq[Long] =
    Seq(-5000000L, -2000000L, -1000000L, 0L, 1000000L, 2000000L, 5000000L)

  /** Classifier OPERATING CURVE (t23): c21 filters at score > 0;
    * this query shows the whole knob — for each threshold on the
    * [[thresholdGridMicronats]] grid, the documents and token mass
    * that would survive and the disagreement with the weak labels.
    * The number a 100 TB curation owner actually tunes: moving the
    * cut one nat trades kept-token mass against rule disagreement,
    * and this emits the full trade-off table in ONE corpus pass (the
    * c14 contamination-curve discipline — never one pass per
    * threshold). Plan: score every doc once (broadcast model, in-row
    * fold), fan each verdict out over the 7-point grid IN-ROW
    * (explode of a literal array — ×7 on a per-doc summary frame,
    * not on text), then a 7-group map-side-combined rollup. All
    * integers: micronat scores, exact counts. */
  def classifierThresholdCurve(s: SparkSession, dir: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val fails = gopherFailCols(col("text"), minWords, maxWords)
    val perDoc = t(s, dir, "documents")
      .withColumn("y", (!fails.reduce(_ || _)).cast("long"))
      .crossJoin(broadcast(readQualityModel(s, dir, minWords, maxWords)))
      .select(col("y"),
        classifierScoreCol(col("text"), col("wm"), col("w_oov"),
          col("prior")).as("score"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
    perDoc
      .select(col("y"), col("score"), col("n_tok"),
        explode(array(thresholdGridMicronats.map(lit): _*)).as("thr"))
      .withColumn("keep", (col("score") > col("thr")).cast("long"))
      .groupBy("thr")
      .agg(sum("keep").as("n_kept"),
        sum(col("keep") * col("n_tok")).as("kept_tokens"),
        sum((col("keep") =!= col("y")).cast("long")).as("n_disagree"))
      .orderBy("thr")
  }

  /** Deterministic per-corpus location for the persisted t21 model,
    * under the session's warehouse dir — the [[graft.ops.Similarity
    * .ivfIndexPath]] addressing contract: a pure `(spark, dir)`
    * query can find its artifact from the corpus dir alone. The
    * Gopher bounds are part of the address (a model trained at
    * different bounds is a DIFFERENT model; silently serving it
    * would be a stale-artifact bug), and so are a FORMAT VERSION —
    * the warehouse outlives code changes, so any semantic change to
    * [[trainQualityModel]] (tokenization, smoothing, freeze) must
    * bump `qualityModelVersion` or ensure would happily serve the
    * old weights while a retraining oracle diverges — and a CORPUS
    * CONTENT STAMP (the documents table's mtime, the bpeTrain cache
    * discipline): a corpus re-derived IN PLACE (ScaleCheck
    * overwrites its xK dirs; testdata regenerates) must retrain,
    * not serve weights learned from data that no longer exists. */
  val qualityModelVersion = "v2" // v2: top-N vocabulary cap + trained OOV mass
  def qualityModelPath(s: SparkSession, dir: String,
      minWords: Int = 50, maxWords: Int = 100000): String = {
    val stamp = Artifacts.contentStamp(s, dir, "documents")
    val cap = classifierVocabSize(s)
    s"${s.conf.get("spark.sql.warehouse.dir")}/graft_quality_model/" +
      s"$qualityModelVersion/${Artifacts.dirTag(dir)}/" +
      s"mw${minWords}_${maxWords}_cv${cap}_st$stamp"
  }

  /** Idempotent train-once: writes the [[trainQualityModel]] row at
    * [[qualityModelPath]] unless a completed artifact (_SUCCESS
    * marker) is already there — the [[graft.ops.Similarity
    * .ensureIvfIndex]] contract for the classifier. This closes the
    * train-once-serve-forever loop a production gate needs: without
    * it every new session (and every streaming restart of
    * [[graft.streaming.Streams.qualityGateStream]]) pays a full
    * training pass over the corpus. The model is pure longs (the
    * [[microLn]] freeze), so the parquet round-trip is bit-exact —
    * a served verdict can never drift from a freshly-trained one
    * (OpsSpec pins row-level equality, t22's oracle replays the
    * training chain against the ARTIFACT-served scores). */
  def ensureQualityModel(s: SparkSession, dir: String,
      minWords: Int = 50, maxWords: Int = 100000): String = {
    val path = qualityModelPath(s, dir, minWords, maxWords)
    // superseded corpus generations are swept, not abandoned: without
    // this, every in-place re-derivation (new stamp, new dir) leaves
    // the old model directory behind forever
    Artifacts.sweepSuperseded(s, path,
      s"mw${minWords}_${maxWords}_cv${classifierVocabSize(s)}_st")
    // VERSION-level sweep: a format bump (v1 → v2 at the r18
    // vocabulary cap) orphans the prior version's whole tree, which
    // no code path ever visits again — retain one predecessor
    // version (a lazy reader still on old code), delete older, so
    // accumulation is bounded at two versions
    Artifacts.sweepSuperseded(s,
      s"${s.conf.get("spark.sql.warehouse.dir")}/graft_quality_model/" +
        qualityModelVersion, "v")
    Artifacts.ensure(s, path)(
      trainQualityModel(s, dir, minWords, maxWords)
        .write.mode("overwrite").parquet(path))
  }

  /** The persisted t21 model as a one-row frame — [[ensureQualityModel]]
    * then a plain parquet read: consumers broadcast it exactly like
    * the freshly-trained row, but the lineage is one file scan, not a
    * training pass (no localCheckpoint discipline needed on the
    * streaming static side). */
  def readQualityModel(s: SparkSession, dir: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame =
    s.read.parquet(ensureQualityModel(s, dir, minWords, maxWords))

  /** Model-artifact datasheet (t22): the persisted classifier
    * described as data — vocabulary size, OOV weight, class prior,
    * and the weight distribution's sign counts and extremes. Serves
    * two jobs at once: (a) the artifact loop (train → persist → read
    * → describe) runs end-to-end inside a pure registry query, so
    * every gate run certifies the round-trip; (b) the DuckDB oracle
    * RETRAINS the model from the corpus and must land on the
    * identical row — persisted-vs-retrained bit-equality checked
    * cross-engine (the micronat freeze is what makes that possible).
    * One in-row map explode over a ONE-ROW frame; corpus untouched
    * beyond the (memoized, ensure-guarded) training pass. */
  def qualityModelDatasheet(s: SparkSession, dir: String): DataFrame = {
    val m = readQualityModel(s, dir)
    m.select(explode(col("wm")).as(Seq("tok", "wt")),
        col("w_oov"), col("prior"))
      .agg(count(lit(1)).as("v"),
        min("w_oov").as("w_oov"), min("prior").as("prior"),
        sum((col("wt") > 0L).cast("long")).as("n_pos"),
        sum((col("wt") < 0L).cast("long")).as("n_neg"),
        sum((col("wt") === 0L).cast("long")).as("n_zero"),
        min("wt").as("wt_min"), max("wt").as("wt_max"))
  }

  /** The t21 scoring expression over `text` given the
    * [[trainQualityModel]] columns — ONE definition so batch report,
    * batch filter and streaming gate can never disagree on a
    * verdict: score = prior + Σ_tokens (weight | w_oov), predict
    * pass iff score > 0 (ties → fail). In-row fold, no shuffle. */
  def classifierScoreCol(text: Column, wm: Column, wOov: Column,
      prior: Column): Column =
    prior + aggregate(tokens(text), lit(0L),
      (acc, tk) => acc + coalesce(try_element_at(wm, tk), wOov))
}
