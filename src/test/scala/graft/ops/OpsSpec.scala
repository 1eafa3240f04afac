package graft.ops

import graft.SparkSpec

/** Sanity checks on the judge-visible query set at sf0.001 (full
  * value-level correctness is the driver's DuckDB gate at sf0.01 —
  * mirrored locally by tools/compare.py). */
class OpsSpec extends SparkSpec {

  test("pricing summary: 6 flag/status groups, positive sums") {
    val rows = Relational.pricingSummary(spark, sf0001).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
  }

  test("region revenue: one row per ASIA nation") {
    val rows = Relational.regionNationRevenue(spark, sf0001).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("skip+take slices the global order") {
    val rows = Relational.skipTakeOrders(spark, sf0001).collect()
    assert(rows.length == 50)
    val keys = rows.map(_.getAs[Long]("o_orderkey"))
    assert(keys.toList == keys.sorted.toList)
  }

  test("takewhile output is a prefix: all below first trigger") {
    val rows = Relational.takeWhileCheap(spark, sf0001).collect()
    assert(rows.forall(_.getAs[Double]("o_totalprice") <= 490000))
  }

  test("first-order-per-customer has one row per ordering customer") {
    val n = Relational.firstOrderPerCustomer(spark, sf0001).count()
    val customers = Relational.t(spark, sf0001, "orders")
      .select("o_custkey").distinct().count()
    assert(n == customers)
  }

  test("ngram jaccard pairs are high-similarity and deduped") {
    val rows = Dedup.ngramJaccardPairs(spark, sf0001).collect()
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.6))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("minhash LSH recalls the exact-jaccard pairs on this corpus") {
    val exact = Dedup.ngramJaccardPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("simhash near-dup pairs overlap the jaccard near-dups") {
    val sim = Dedup.simhashPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // sketches disagree at the margin but must find the bulk
    assert(exact.nonEmpty && (exact intersect sim).size >= exact.size / 2)
  }

  test("brute-force topk returns k neighbors per query, sim in [-1,1]") {
    val rows = Similarity.bruteForceTopK(spark, sf0001, nQueries = 5, k = 3).collect()
    assert(rows.length == 15)
    assert(rows.forall { r =>
      val s = r.getAs[Double]("sim"); s >= -1.0001 && s <= 1.0001
    })
  }

  test("LSH topk neighbors are a subset of scored corpus with decent recall@1") {
    val brute = Similarity.bruteForceTopK(spark, sf0001, nQueries = 10, k = 1)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toMap
    val lsh = Similarity.lshTopK(spark, sf0001, nQueries = 10, k = 1)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toMap
    // 8 tables x 4 bits: expected recall@1 ~0.8 even for weakly
    // clustered vectors (per-bit agreement ~0.67 at cosine 0.5)
    val hits = brute.count { case (q, c) => lsh.get(q).contains(c) }
    assert(hits >= 4, s"recall@1 too low: $hits/10")
  }

  test("multimodal decode runs batched and yields one row per media") {
    val rows = Multimodal.decodeFeatures(spark, sf0001).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getAs[Long]("checksum") != 0))
  }

  test("sessionization: session ids are dense per user") {
    val rows = Events.sessionStats(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_sessions") >= 1))
  }

  test("entry flagship returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has either an oracle or a documented exemption") {
    val exempt = Set("d05_simhash_pairs", "s02_lsh_topk", "m02_decode_features",
      "q24_approx_distinct")
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert((q -- o) == exempt)
  }
}
