package graft.ops

import graft.SparkSpec

/** Persisted IVF index: layout-as-inverted-file. The value claim is
  * twofold — (a) results are byte-identical to the per-query plan
  * (same codebook, probes, exact re-rank), (b) the probe join prunes
  * the scan to the probed cell PARTITIONS (dynamic partition
  * pruning), which is the nprobe/nlist selectivity that makes a
  * persisted index pay at corpus scale. */
class IvfIndexSpec extends SparkSpec {

  test("indexed IVF equals the per-query IVF result exactly") {
    val idxPath = "/tmp/graft_ivf_index_spec"
    Similarity.buildIvfIndex(spark, sf0001, idxPath)
    val direct = Similarity.ivfTopK(spark, sf0001).collect().map(_.toSeq).toList
    val viaIdx = Similarity.ivfTopKIndexed(spark, sf0001, idxPath)
      .collect().map(_.toSeq).toList
    assert(viaIdx == direct)
  }

  test("ensureIvfIndex is idempotent and addressable from the corpus dir alone") {
    val path = Similarity.ensureIvfIndex(spark, sf0001)
    val marker = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(marker))
    val mtime = fs.getFileStatus(marker).getModificationTime
    // second call is a no-op read of the marker, not a rebuild
    assert(Similarity.ensureIvfIndex(spark, sf0001) == path)
    assert(fs.getFileStatus(marker).getModificationTime == mtime)
    // the s11 registration shape: pure-reader query over the layout
    val viaIdx = Similarity.ivfTopKIndexed(spark, sf0001, path)
      .collect().map(_.toSeq).toList
    val direct = Similarity.ivfTopK(spark, sf0001).collect().map(_.toSeq).toList
    assert(viaIdx == direct)
  }

  test("probe join prunes the index scan to probed cell partitions") {
    val idxPath = "/tmp/graft_ivf_index_spec"
    Similarity.buildIvfIndex(spark, sf0001, idxPath)
    val df = Similarity.ivfTopKIndexed(spark, sf0001, idxPath)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the index scan:\n$p")
  }

  test("routed indexed IVF (s22) equals per-query s20 exactly and still prunes") {
    val idxPath = "/tmp/graft_ivf_index_spec"
    Similarity.buildIvfIndex(spark, sf0001, idxPath)
    val direct = Similarity.ivf2TopK(spark, sf0001).collect().map(_.toSeq).toList
    val df = Similarity.ivf2TopKIndexed(spark, sf0001, idxPath)
    val viaIdx = df.collect().map(_.toSeq).toList
    assert(viaIdx == direct,
      "persisted-path routed IVF must equal the per-query routed plan row-for-row")
    // the composed claim: the ROUTER picked the probes AND the index
    // scan is partition-pruned to them
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the routed index scan:\n$p")
  }

  test("tombstoned reads (s26): deleted ids vanish, ranks re-close, the " +
    "delete genuinely bit, and the index scan still prunes") {
    val idxPath = "/tmp/graft_ivf_index_spec"
    Similarity.buildIvfIndex(spark, sf0001, idxPath)
    val live = Similarity.ivfTopKIndexed(spark, sf0001, idxPath).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val df = Similarity.ivfTopKTombstoned(spark, sf0001, idxPath)
    val tomb = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // no deleted id survives anywhere in any top-k
    assert(tomb.forall { case (_, _, cId) => cId % 7 != 3 },
      "a tombstoned candidate appeared in a top-k list")
    // the tombstone pass must actually DELETE something that was live
    // (a no-op delete set certifies nothing)
    assert(live.exists { case (_, _, cId) => cId % 7 == 3 },
      "test premise broken: no live top-k entry carries a tombstoned id")
    assert(tomb.toSeq != live.toSeq, "results must differ from s11's")
    // ranks re-close densely per query: 1..k with no holes
    tomb.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length.toLong),
        s"query $q ranks must re-close after deletes")
    }
    // untouched queries (no tombstone in their candidate set) are
    // bit-identical to the live path
    val touched = live.collect { case (q, _, cId) if cId % 7 == 3 => q }.toSet
    val liveBy = live.groupBy(_._1); val tombBy = tomb.groupBy(_._1)
    (liveBy.keySet -- touched).foreach { q =>
      assert(tombBy(q).toSeq == liveBy(q).toSeq,
        s"query $q had no deleted candidate in its top-k but changed")
    }
    // the freshness join must not cost the pruning
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the tombstoned scan:\n$p")
  }

  test("compaction (s27): folded layout equals tombstoned reads exactly, " +
    "holds zero deleted rows, keeps the one-file-per-cell shape and DPP") {
    val idxPath = "/tmp/graft_ivf_index_spec"
    Similarity.buildIvfIndex(spark, sf0001, idxPath)
    val outPath = "/tmp/graft_ivf_index_spec_compact"
    Similarity.compactIvfIndex(spark, sf0001, idxPath, outPath)
    // identical results through the PLAIN s11 read path — no per-query
    // tombstone join anymore
    val viaTomb = Similarity.ivfTopKTombstoned(spark, sf0001, idxPath)
      .collect().map(_.toSeq).toList
    val df = Similarity.ivfTopKIndexed(spark, sf0001, outPath)
    assert(df.collect().map(_.toSeq).toList == viaTomb,
      "compacted reads must equal tombstoned reads row-for-row")
    // the layout physically dropped every tombstoned row
    import org.apache.spark.sql.functions.{col, pmod, lit}
    assert(spark.read.parquet(outPath)
      .filter(pmod(col("c_id"), lit(7)) === 3).count() == 0,
      "a tombstoned row survived compaction on disk")
    // row accounting: live rows minus deletes, nothing else lost
    val before = spark.read.parquet(idxPath).count()
    val deleted = spark.read.parquet(idxPath)
      .filter(pmod(col("c_id"), lit(7)) === 3).count()
    assert(spark.read.parquet(outPath).count() == before - deleted)
    // writePartitionedByCell's shape claim holds through compaction:
    // exactly one data file per surviving cell directory
    val cells = new java.io.File(outPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cells.nonEmpty)
    cells.foreach { c =>
      val files = c.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"cell ${c.getName} has ${files.length} files — compaction must yield one")
    }
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the compacted scan:\n$p")
  }

  test("epoch switch (s28): CURRENT resolves tombstoned-over-main before " +
    "the flip and PLAIN-over-compact after — identical rows, the anti-join " +
    "leaves the plan, DPP intact on both sides") {
    import org.apache.hadoop.fs.Path
    // clean slate for the GENERATION (the warehouse outlives sbt runs):
    // drop the pointer and the compacted layout so THIS run exercises
    // the pre-flip side first
    val main = Similarity.ensureIvfIndex(spark, sf0001)
    val genDir = new Path(main).getParent
    val fs = genDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(genDir, "CURRENT_nl32"), false)
    fs.delete(new Path(genDir, "compact_nl32"), true)
    assert(Similarity.ivfCurrentEpoch(spark, sf0001) == "main",
      "an absent pointer must resolve to the main epoch")
    val pre = Similarity.ivfTopKCurrent(spark, sf0001)
    val preRows = pre.collect().map(_.toSeq).toList
    val pPre = pre.queryExecution.executedPlan.toString
    assert(pPre.contains("LeftAnti"),
      s"pre-flip reads must apply the tombstone anti-join:\n$pPre")
    assert(pPre.toLowerCase.contains("dynamicpruning"),
      s"no DPP on the pre-flip scan:\n$pPre")
    assert(preRows == Similarity.ivfTopKTombstoned(spark, sf0001, main)
      .collect().map(_.toSeq).toList,
      "pre-flip resolver must equal the explicit tombstoned read")
    // compact → the ensure flips the pointer
    Similarity.ensureCompactedIvfIndex(spark, sf0001)
    assert(Similarity.ivfCurrentEpoch(spark, sf0001) == "compact",
      "ensureCompactedIvfIndex must flip CURRENT")
    val post = Similarity.ivfTopKCurrent(spark, sf0001)
    val postRows = post.collect().map(_.toSeq).toList
    val pPost = post.queryExecution.executedPlan.toString
    assert(!pPost.contains("LeftAnti"),
      s"post-flip reads must take the PLAIN path — the tombstone join " +
        s"must leave the PLAN, not just the result:\n$pPost")
    assert(pPost.toLowerCase.contains("dynamicpruning"),
      s"no DPP on the post-flip scan:\n$pPost")
    assert(postRows == preRows,
      "the switch must be invisible in results — identical rows on both sides")
    // idempotent flip: a second ensure neither rebuilds nor unflips
    assert(Similarity.ensureCompactedIvfIndex(spark, sf0001) ==
      s"$genDir/compact_nl32")
    assert(Similarity.ivfCurrentEpoch(spark, sf0001) == "compact")
  }

  test("epoch switch (s29): the ROUTED production read resolves " +
    "tombstoned-over-main before the flip and PLAIN-over-compact after — " +
    "identical rows, the anti-join leaves the plan, DPP intact, and the " +
    "tombstones genuinely bite") {
    import org.apache.hadoop.fs.Path
    // clean slate for the generation, pre-flip side first (s28's drill)
    val main = Similarity.ensureIvfIndex(spark, sf0001)
    val genDir = new Path(main).getParent
    val fs = genDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(genDir, "CURRENT_nl32"), false)
    fs.delete(new Path(genDir, "compact_nl32"), true)
    val pre = Similarity.ivf2TopKCurrent(spark, sf0001)
    val preRows = pre.collect().map(_.toSeq).toList
    val pPre = pre.queryExecution.executedPlan.toString
    assert(pPre.contains("LeftAnti"),
      s"pre-flip routed reads must apply the tombstone anti-join:\n$pPre")
    assert(pPre.toLowerCase.contains("dynamicpruning"),
      s"no DPP on the pre-flip routed scan:\n$pPre")
    // a delete pass that deletes nothing certifies nothing: the
    // lifecycle result must genuinely differ from the raw s22 read
    val raw = Similarity.ivf2TopKIndexed(spark, sf0001, main)
      .collect().map(_.toSeq).toList
    assert(preRows != raw,
      "tombstones must hit live routed top-k lists on this corpus")
    Similarity.ensureCompactedIvfIndex(spark, sf0001)
    val post = Similarity.ivf2TopKCurrent(spark, sf0001)
    val postRows = post.collect().map(_.toSeq).toList
    val pPost = post.queryExecution.executedPlan.toString
    assert(!pPost.contains("LeftAnti"),
      s"post-flip routed reads must take the PLAIN path — the tombstone " +
        s"join must leave the PLAN, not just the result:\n$pPost")
    assert(pPost.toLowerCase.contains("dynamicpruning"),
      s"no DPP on the post-flip routed scan:\n$pPost")
    assert(postRows == preRows,
      "the switch must be invisible in routed results — identical rows")
  }
}
