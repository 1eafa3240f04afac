package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent-implementation cross-checks: the repo's hand-built
  * distributed algorithms must agree with Spark's OWN shipped
  * implementations of the same mathematics (GraphX, MLlib) on the
  * gate corpus. This is a third certification axis next to the
  * DuckDB oracles (cross-ENGINE) and the plain-Scala models
  * (cross-FORMULATION): a bug that survived both would also have to
  * reproduce inside an implementation we didn't write. The library
  * itself stays DataFrame-first — GraphX/MLlib appear ONLY here, as
  * referees. */
class CrossEngineSpec extends SparkSpec {

  test("d07: pointer-doubling components ≡ GraphX ConnectedComponents") {
    // same verified near-dup edges both ways
    val pairs = Dedup.ngramJaccardPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val s = spark
    import s.implicits._
    val edgesDf = pairs.toSeq.toDF("src", "dst")
    val ours = Dedup.connectedComponents(edgesDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // GraphX on the identical edge list; its CC also labels each
    // component with the minimum vertex id, so the maps must be EQUAL,
    // not merely isomorphic
    val gx = org.apache.spark.graphx.Graph.fromEdgeTuples(
      spark.sparkContext.parallelize(pairs.toSeq), defaultValue = 0)
      .connectedComponents().vertices.collect()
      .map { case (id, label) => id -> label }.toMap
    assert(ours == gx)
  }

  test("d03/d04: the verified near-dup pair set ≡ MLlib MinHashLSH at full recall") {
    val s = spark
    import s.implicits._
    import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
    // the same 5-gram shingle universe the d-ladder hashes, as ML
    // binary vectors (presence, not counts — Jaccard's domain)
    val sh = Relational.t(spark, sf0001, "documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"),
        array_distinct(transform(sequence(lit(0), size(col("w")) - 5),
          i => concat_ws(" ", slice(col("w"), i + 1, lit(5))))).as("shingles"))
    val cv = new CountVectorizer().setInputCol("shingles").setOutputCol("features")
      .setBinary(true).fit(sh)
    val feat = cv.transform(sh).select("doc_id", "features")
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(16).setSeed(42L).fit(feat)
    // approxSimilarityJoin verifies candidates with EXACT Jaccard
    // distance, so at sufficient table count its pair set equals the
    // exact ground truth; threshold 0.4 distance = our 0.6 similarity
    // (MLlib's cut is strict >, ours inclusive ≥ — compare on the
    // recomputed r3 similarity to share one boundary rule)
    val mllib = lsh.approxSimilarityJoin(feat, feat, 0.45, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"),
        col("dist"))
      .filter(col("a") < col("b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (math.floor((1.0 - r.getDouble(2)) * 1000 + 0.5) / 1000))
      .toMap
      .filter(_._2 >= 0.6)
    val exact = Dedup.ngramJaccardPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(mllib.keySet == exact.keySet,
      s"MLlib found ${mllib.keySet.size}, exact has ${exact.keySet.size}")
    // the exact-verified Jaccard values agree to one r3 grid step:
    // 1.0 - (1.0 - j) can sit 1 ulp off j, which flips the .0005
    // rounding boundary on one side only — an exact-equality assert
    // here would be a false-failure mode, not a bug detector
    exact.foreach { case (k, j) =>
      assert(math.abs(mllib(k) - j) <= 0.001 + 1e-12, s"pair $k")
    }
  }
}
