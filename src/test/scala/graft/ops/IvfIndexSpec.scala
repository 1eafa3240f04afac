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
}
