package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class SamplingSpec extends SparkSpec {

  test("rate edge cases: 1.0 keeps every row, 0.0 keeps none") {
    val docs = Relational.t(spark, sf0001, "documents")
    val total = docs.count()
    assert(Sampling.hashSample(docs, col("doc_id"), 1.0).count() == total)
    assert(Sampling.hashSample(docs, col("doc_id"), 0.0).count() == 0)
  }

  test("sample rate lands near the target on uniform keys") {
    val docs = Relational.t(spark, sf0001, "documents")
    val total = docs.count().toDouble
    val got = Sampling.hashSample(docs, col("doc_id"), 0.3).count() / total
    assert(got > 0.2 && got < 0.4, s"rate 0.3 drew $got")
  }

  test("nested sample property: a 10% sample is a subset of the 50% sample") {
    // thresholds nest, so rate r1 < r2 => sample(r1) ⊆ sample(r2) —
    // the property that makes hash splits stable as rates are tuned
    val docs = Relational.t(spark, sf0001, "documents")
    val s10 = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s50 = Sampling.hashSample(docs, col("doc_id"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s50))
  }
}
