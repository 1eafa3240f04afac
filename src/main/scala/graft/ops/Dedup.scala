package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Relational.{t, r3}
import graft.stream.Ordered

/** Deduplication suite for training-data pipelines, each variant
  * designed shuffle-parallel:
  *
  *  - exact: hash-groupBy on a fingerprint (one shuffle on a 32-byte
  *    key — at 100 TB dedup the md5, never the document body).
  *  - MinHash + LSH: shingle → minhash signature → band buckets →
  *    candidate pairs from bucket joins → exact-Jaccard verify.
  *    Candidate generation touches only same-bucket pairs, the classic
  *    way to avoid the O(n²) cross join at corpus scale.
  *  - SimHash: 64-bit signature; near-dups = same band in ≥1 of 4
  *    16-bit bands then hamming ≤ k verify.
  *  - n-gram Jaccard: exact pairwise similarity via a shingle
  *    self-join — the ground-truth (quadratic-ish) path used to
  *    validate the sketches at small SF.
  *  - embedding cosine: see [[Similarity]].
  */
object Dedup {

  /** Word n-gram shingles as a distinct (doc_id, shingle) relation. */
  def shingles(docs: DataFrame, n: Int): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    docs.select(col("doc_id"), toks.as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - n),
          i => concat_ws(" ", slice(col("w"), i + 1, lit(n))))).as("shingle"))
      .distinct()
  }

  /** Shingles reduced to 64-bit hashes — the representation every
    * join/agg below actually runs on. Hashing happens BEFORE the
    * distinct so the dedup shuffle, the self-joins and the minhash agg
    * all move 8-byte longs instead of ~n-word strings (at 100 TB this
    * is the difference between shuffling the corpus and shuffling a
    * fingerprint of it). Jaccard over hashed shingle sets equals
    * Jaccard over the strings up to xxhash64 collisions —
    * P(any collision) ≈ m²/2⁶⁵ ≈ 10⁻⁸ at a million distinct shingles. */
  def shingleHashes(docs: DataFrame, n: Int): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    docs.select(col("doc_id"), toks.as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - n),
          i => xxhash64(concat_ws(" ", slice(col("w"), i + 1, lit(n)))))).as("h"))
      .distinct()
  }

  /** Exact dedup via content fingerprint, first-wins (lowest doc_id
    * survives), summarized per lang. */
  def exactDedupByLang(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    Ordered.firstWins(docs, keys = Seq(col("fp")), ord = Seq(col("doc_id")))
      .groupBy("lang").agg(count(lit(1)).as("n_unique"))
      .orderBy("lang")
  }

  /** Exact duplicate groups: fingerprints appearing more than once,
    * with their member doc_ids (sorted, comma-joined for oracle
    * comparability). */
  def duplicateGroups(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .groupBy("fp")
      .agg(count(lit(1)).as("n"),
        array_join(transform(array_sort(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("doc_ids"))
      .filter(col("n") > 1)
      .orderBy("fp")

  /** Exact pairwise n-gram Jaccard over shingle self-join: pairs with
    * J >= `threshold`. Ground truth for the MinHash sketch below. */
  def ngramJaccardPairs(s: SparkSession, dir: String, n: Int = 5,
      threshold: Double = 0.6): DataFrame = {
    val sh = shingleHashes(t(s, dir, "documents"), n).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.as("a"); val b = sh.as("b")
    val inter = a.join(b,
        col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    // no broadcast hint on sizes: it is |corpus|-sized (huge at
    // 100 TB); AQE broadcasts it automatically at small SF
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "sz_b"), "doc_b")
      .withColumn("jaccard",
        r3(col("inter") / (col("sz_a") + col("sz_b") - col("inter"))))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signatures over hashed shingles (`h` column from
    * [[shingleHashes]]): derive `numHashes` permutations by re-hashing
    * the 8-byte value with a per-permutation seed — 64 long-hashes per
    * shingle instead of 64 full string hashes (and no Long-overflow
    * issue under ANSI mode, unlike the a*h+b universal-hashing trick).
    * One narrow agg per doc, no driver state. */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val hashCols = (0 until numHashes).map { i =>
      min(xxhash64(lit(i), col("h"))).as(s"h$i")
    }
    sh.groupBy("doc_id").agg(hashCols.head, hashCols.tail: _*)
  }

  /** MinHash-LSH near-dup candidate pairs, verified with exact
    * Jaccard. `bands` × `rows` must equal `numHashes`. Probability a
    * pair with Jaccard j collides: 1 - (1 - j^rows)^bands — with
    * 16×4 the S-curve knees near j ≈ 0.5. At 100 TB: candidate
    * generation is a groupBy on (band, bandHash) — only same-bucket
    * docs ever meet, and AQE handles hot buckets.
    */
  def minhashLshPairs(s: SparkSession, dir: String, n: Int = 5,
      bands: Int = 16, rows: Int = 4,
      threshold: Double = 0.6): DataFrame = {
    val numHashes = bands * rows
    val docs = t(s, dir, "documents")
    val sh = shingleHashes(docs, n).cache()
    val sig = minhashSignatures(sh, numHashes)
    // band b = hash of (h_{b*rows} ... h_{b*rows+rows-1}); melt the
    // bands into (doc_id, band_idx, band_hash) rows so candidate
    // generation is ONE groupBy-shaped self-join on (band_idx, hash)
    // instead of `bands` separate shuffles.
    val bandCols = (0 until bands).flatMap { b =>
      Seq(lit(b), xxhash64((b * rows until (b + 1) * rows).map(i => col(s"h$i")): _*))
    }
    // cached: the candidate self-join consumes `melted` twice, and
    // without the cache each side re-runs the 64-min signature agg
    val melted = sig.select(col("doc_id"),
      explode(map(bandCols: _*)).as(Seq("band_idx", "bh"))).cache()
    val candidates = melted.as("x")
      .join(melted.as("y"),
        col("x.band_idx") === col("y.band_idx") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // exact-Jaccard verify on candidates only
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    pairJaccard(candidates, sh, sizes, threshold)
  }

  /** Exact Jaccard for an explicit candidate-pair set (over hashed
    * shingles — see [[shingleHashes]]). */
  private def pairJaccard(pairs: DataFrame, sh: DataFrame, sizes: DataFrame,
      threshold: Double): DataFrame = {
    val shA = sh.select(col("doc_id").as("doc_a"), col("h"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("h"))
    val inter = pairs.join(shA, "doc_a").join(shB, Seq("doc_b", "h"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("sz_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("sz_b")), "doc_b")
      .withColumn("jaccard",
        r3(col("inter") / (col("sz_a") + col("sz_b") - col("inter"))))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding-cosine near-duplicate pairs: random-hyperplane LSH
    * buckets candidates ([[Similarity.lshBuckets]]), exact cosine
    * verifies. The semantic-dedup member of the family (exact /
    * Jaccard / MinHash / SimHash cover lexical duplication; this
    * catches paraphrases that share an embedding). At the near-dup
    * operating point (cosine ≥ 0.9, per-bit agreement p ≥ 0.86) the
    * 8-bit × 8-table sketch recalls a true pair w.p. ≥ 1-(1-p⁸)⁸ ≈
    * 0.93, → 0.9996 at 0.95 — while random pairs collide at only
    * 2⁻⁸/table, so candidate volume stays ~n·8/256 ≪ n². The corpus
    * never self-joins un-bucketed; at 100 TB only same-bucket pairs
    * meet, and AQE splits any hot bucket. (On the synthetic testdata
    * no pair exceeds cosine 0.52, so the verified result is empty —
    * matching the brute-force oracle.) */
  def embeddingNearDups(s: SparkSession, dir: String, bits: Int = 8,
      tables: Int = 8, threshold: Double = 0.9): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val buckets = Similarity.lshBuckets(emb, "vec_id", "embedding", bits, tables)
      .cache()
    val candidates = (0 until tables).map { tb =>
      val l = buckets.select(col("vec_id").as("vec_a"), col(s"b$tb").as("bk"))
      val r = buckets.select(col("vec_id").as("vec_b"), col(s"b$tb").as("bk"))
      l.join(r, Seq("bk")).filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b")
    }.reduce(_ unionAll _).distinct()
    val ea = emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val eb = emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    candidates.join(ea, "vec_a").join(eb, "vec_b")
      .withColumn("sim", Relational.r4(Similarity.cosine(col("emb_a"), col("emb_b"))))
      .filter(col("sim") >= threshold)
      .select("vec_a", "vec_b", "sim")
      .orderBy("vec_a", "vec_b")
  }

  /** 64-bit SimHash per document: sign-sum of per-token hash bits,
    * all in column space (no UDF): explode tokens → per-bit ±1 votes →
    * sum → sign → reassemble. */
  def simhashes(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // pre-aggregate repeated tokens: votes become count-weighted, the
    // wide 64-column agg then runs over |distinct (doc,token)| rows
    // instead of |tokens| rows
    val toks = docs.select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy(col("doc_id"), xxhash64(col("tok")).as("h"))
      .agg(count(lit(1)).as("cnt"))
    // vote_i = sum(cnt * (bit_i ? +1 : -1)) > 0  ⟺  2*sum(cnt*bit_i)
    // > sum(cnt); branch-free arithmetic keeps the agg codegen-tight
    val bitSums = (0 until 64).map { i =>
      sum(col("cnt") * shiftright(col("h"), i).bitwiseAND(1)).as(s"b$i")
    } :+ sum(col("cnt")).as("total")
    val voted = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { i =>
      when(col(s"b$i") * 2 > col("total"), shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    voted.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs: LSH on 4×16-bit bands, then hamming
    * distance ≤ `maxHamming` verify via bit_count(xor). */
  def simhashPairs(s: SparkSession, dir: String,
      maxHamming: Int = 6): DataFrame = {
    val sig = simhashes(s, dir).cache()
    val banded = sig.select(Seq(col("doc_id"), col("simhash")) ++ (0 until 4).map { b =>
      shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as(s"band$b")
    }: _*)
    val candidates = (0 until 4).map { b =>
      val l = banded.select(col("doc_id"), col("simhash"), col(s"band$b").as("bk"))
      val r = l.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"), col("bk"))
      l.join(r, Seq("bk")).filter(col("doc_id") < col("doc_b"))
        .select(col("doc_id").as("doc_a"), col("doc_b"),
          col("simhash"), col("sim_b"))
    }.reduce(_ unionAll _).distinct()
    candidates
      .withColumn("hamming", bit_count(col("simhash").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }
}
