package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin matches the plain join result") {
    val s = spark
    import s.implicits._
    // skewed fact: key 1 dominates
    val fact = (Seq.fill(500)(1) ++ (2 to 50)).zipWithIndex
      .map { case (k, i) => (k, i) }.toDF("key", "payload")
    val dim = (1 to 50).map(k => (k, s"dim$k")).toDF("key", "name")
    val plain = fact.join(dim, "key").select("key", "payload", "name")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(fact, dim, "key", buckets = 8)
      .select("key", "payload", "name")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted
    assert(salted.toList == plain.toList)
  }

  test("saltedCountDistinct is exact, not approximate") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).map(i => (i % 3, s"v${i % 97}")).toDF("k", "v")
    val exact = df.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val salted = Skew.saltedCountDistinct(df, col("k"), col("v"), buckets = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(salted == exact)
  }
}
