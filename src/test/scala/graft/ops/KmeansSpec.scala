package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lloyd-iteration codebook semantics on crafted corpora (the sf0.01
  * DuckDB oracle certifies the full unrolled computation; these pin
  * the invariants and the degeneracy path on minimal inputs). */
class KmeansSpec extends SparkSpec {

  private def embDir(rows: Seq[(Long, Seq[Float])]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kmeans").toString
    rows.toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("every vector is assigned exactly once; codebook is nlist x dims") {
    val out = Similarity.kmeansCodebook(spark, sf0001).collect()
    val dims = out.map(_.getLong(2)).max + 1
    val cells = out.map(_.getLong(0)).distinct
    assert(cells.length == 32 && out.length == 32 * dims)
    // n_members is constant per cell and sums to the corpus size
    val members = out.map(r => r.getLong(0) -> r.getLong(1)).distinct
    assert(members.length == 32)
    val corpus = Relational.t(spark, sf0001, "embeddings").count()
    assert(members.map(_._2).sum == corpus)
  }

  test("an empty cell keeps its seed centroid with zero members") {
    // both seeds are the IDENTICAL vector, so every corpus vector ties
    // across the two cells and the tie-break (lowest cell id) sends
    // everything to cell 0 — cell 1 is empty in every round and the
    // Lloyd degeneracy path must carry its seed centroid through
    // unchanged with n_members = 0
    val a = Seq(1.0f, 0.0f, 0.0f)
    val dir = embDir(Seq(
      (0L, a), (1L, Seq(0.9f, 0.1f, 0.0f)), (2L, Seq(0.95f, 0.05f, 0.0f)),
      (100L, a), (101L, a)))
    val out = Similarity.kmeansCodebook(spark, dir, nlist = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val cells = out.groupBy(_._1)
    assert(cells.keySet == Set(0L, 1L))
    // cell 1 attracted nothing during BOTH update rounds (ties went to
    // cell 0), so the degeneracy path must have carried its seed
    // through unchanged...
    val c1 = cells(1L).sortBy(_._3)
    assert(c1.map(_._4).toSeq == Seq(1.0, 0.0, 0.0), "empty cell keeps its seed")
    // ...and in the FINAL assignment that pristine seed wins back the
    // three vectors exactly on-axis (cell 0's trained mean drifted off
    // it), while the two off-axis vectors stay with the trained mean —
    // n_members reports the final assignment, not the training rounds
    assert(c1.head._2 == 3L, s"expected 3 members in cell 1, got ${c1.head._2}")
    assert(cells(0L).head._2 == 2L)
  }

  test("trained codebook is a PERSISTED artifact: ensure is build-once, " +
    "hyperparameters address their own trees, and persisted equals " +
    "retrained at full double bits") {
    // six query families consume one Lloyd training; r18 memoized it
    // per SESSION (every new driver retrained — a full corpus pass ×
    // iters before any trained-IVF query); r19 gives it the
    // ensureQualityModel treatment: _SUCCESS-guarded build at a
    // stamped address, then every consumer serves from the artifact
    val path = Similarity.ensureCodebook(spark, sf0001, 32, 2)
    val marker = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(marker))
    val mtime = fs.getFileStatus(marker).getModificationTime
    // repeat ensure is a marker read, not a rebuild
    assert(Similarity.ensureCodebook(spark, sf0001, 32, 2) == path)
    assert(fs.getFileStatus(marker).getModificationTime == mtime)
    // every training hyperparameter is part of the ADDRESS
    val path16 = Similarity.ensureCodebook(spark, sf0001, 16, 2)
    assert(path16 != path, "different nlist must address its own artifact")
    assert(Similarity.trainedCentroids(spark, sf0001, 16, 2)._1
      .select("cell").distinct().count() == 16)
    // the serve-path contract: the artifact read is BIT-IDENTICAL to
    // a fresh training pass (parquet round-trips IEEE-754 doubles
    // exactly; the decimal-sum update rule is deterministic) — the
    // full-precision half of the s32 oracle's r4-grid certification
    val served = Similarity.trainedCentroids(spark, sf0001, 32, 2)._1
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val retrained = Similarity.trainCodebookFrame(spark, sf0001, 32, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(served == retrained,
      "persisted codebook must equal a fresh training bit-for-bit")
  }

  test("cosine kernel accepts double arrays and matches the composable form") {
    import org.apache.spark.sql.Row
    val df = Relational.t(spark, sf0001, "embeddings").limit(50)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("d"),
        col("embedding").as("f"))
    val got = df.select(
        graft.functions.CosineSimilarity(col("d"), col("d")).as("dd"),
        graft.functions.CosineSimilarity(col("f"), col("d")).as("fd"),
        Similarity.cosineComposable(col("f"), col("f")).as("ref"))
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-12)
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12)
    }
  }
}
