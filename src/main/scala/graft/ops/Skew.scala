package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys at 100 TB.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) handles
  * most cases at runtime; these are the explicit variants for when the
  * skew is known ahead of time (a handful of mega-keys in a fact
  * table) or the join shape defeats AQE (e.g. aggregation buffers, not
  * partition sizes, are the bottleneck).
  */
object Skew {

  /** Salted fact-to-dim join: the fact side gets a random salt in
    * [0, buckets), the dim side is replicated `buckets` times, and the
    * join key becomes (key, salt) — a single hot key now spreads over
    * `buckets` reducers. Use when the dim side is too big to
    * broadcast but the fact side has mega-keys. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregation with an explicit salt: phase 1 aggregates
    * (key, salt) partials, phase 2 merges per key. Catalyst's
    * map-side partial aggregation already does this implicitly for
    * algebraic aggregates; the explicit form is for aggregates whose
    * per-key state is large (collect_list/distinct-heavy), where one
    * hot key would blow a single reducer's buffer. */
  def saltedCountDistinct(df: DataFrame, key: Column, value: Column,
      buckets: Int): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .withColumn("_salt", pmod(hash(col("v")), lit(buckets)))
      .groupBy(col("k"), col("_salt"))
      .agg(countDistinct(col("v")).as("_partial"))
      // distinct values are partitioned by hash(v) → partials are
      // disjoint → summing them is exact, not an approximation
      .groupBy(col("k"))
      .agg(sum("_partial").as("n_distinct"))
}
