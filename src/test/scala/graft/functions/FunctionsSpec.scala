package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  test("native cosine expression matches the composable formulation") {
    val s = spark
    val emb = s.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("eb"))
    val both = a.crossJoin(b).filter(col("ida") < col("idb"))
      .withColumn("fast", CosineSimilarity(col("ea"), col("eb")))
      .withColumn("slow", Similarity.cosine(col("ea"), col("eb")))
      .select("fast", "slow").collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("native cosine participates in codegen (no fallback)") {
    val s = spark
    val emb = s.read.parquet(s"$sf0001/embeddings.parquet").limit(5)
    val df = emb.select(CosineSimilarity(col("embedding"), col("embedding")).as("self"))
    val rows = df.collect()
    // self-similarity is exactly 1 (same buffer both sides)
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
    df.queryExecution.executedPlan // planning must not throw
  }

  test("cosine expression rejects non-float-array inputs at analysis") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "x")).toDF("i", "t")
    val ex = intercept[Exception] {
      df.select(CosineSimilarity(col("i"), col("t"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("cosine") ||
      ex.getMessage.toLowerCase.contains("data type"))
  }

  test("TopKAggregator matches the sort-then-take model exactly") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // coarse scores force ties → exercises the deterministic tiebreak
    val data = for (q <- 0 until 8; c <- 0 until 200)
      yield (q.toLong, Scored(c.toLong, math.floor(rnd.nextDouble() * 100) / 100))
    val ds = s.createDataset(data)
    val aggRes = ds.groupByKey(_._1).mapValues(_._2)
      .agg(new TopKAggregator(5).toColumn)
      .collect().toMap
    val model = data.groupBy(_._1).view.mapValues { vs =>
      vs.map(_._2).sortBy(sc => (-sc.score, sc.id)).take(5).toList
    }.toMap
    assert(aggRes.keySet == model.keySet)
    model.foreach { case (q, exp) => assert(aggRes(q).toList == exp, s"q=$q") }
  }
}
