package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed-table co-located join — the "pre-bucket both sides" scale
  * path from SCALING.md: when the dimension outgrows broadcast range,
  * writing both join sides bucketed+sorted on the key lets the join
  * run with NO Exchange at query time (the shuffle is paid once at
  * write time, amortized over every subsequent join — the bucketing
  * contract a 100 TB warehouse is built on).
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key runs without a shuffle") {
    val s = spark
    val wh = java.nio.file.Files.createTempDirectory("graft-bucketed")
    try {
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_customer")
    Relational.t(s, sf0001, "orders")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders")
      .mode("overwrite").saveAsTable("b_orders")
    Relational.t(s, sf0001, "customer")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/b_customer")
      .mode("overwrite").saveAsTable("b_customer")
    // forbid broadcast so the join must use the bucketing
    val joined = s.table("b_orders").hint("merge")
      .join(s.table("b_customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(plan.contains("Bucketed: true"), s"scan must use the buckets:\n$plan")
    // the join inputs read pre-bucketed data: no exchange on either
    // join key (the only Exchange left is the post-join groupBy's)
    assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
      !plan.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed join must not re-shuffle its inputs:\n$plan")
    // same result as the plain (broadcast) join
    val expected = Relational.t(s, sf0001, "orders")
      .join(Relational.t(s, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected)
    } finally {
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_customer")
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete()
      }
      rm(wh.toFile)
    }
  }
}
