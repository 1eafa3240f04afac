package graft.ops

import org.apache.spark.sql.SparkSession

/** The ONE _SUCCESS-guarded idempotent-build idiom behind every
  * persisted artifact (IVF index, compacted index, quality model) —
  * extracted so a fix to the idiom reaches all of them at once. A
  * prior write that died BEFORE its _SUCCESS marker leaves no marker,
  * so the next ensure re-runs the build; every builder writes with
  * mode("overwrite"), which clears the partial remnants first. */
private[graft] object Artifacts {
  def ensure(s: SparkSession, path: String)(build: => Unit): String = {
    val marker = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) build
    path
  }
}
