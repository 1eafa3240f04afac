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

  /** The corpus CONTENT STAMP every persisted artifact's address must
    * carry (quality model, IVF index): the source table's mtime
    * through the Hadoop FileSystem API — java.io.File.lastModified
    * silently returns 0 on any non-local dir (hdfs://, s3a://),
    * which would degrade the staleness guard to a no-op exactly
    * where a real deployment needs it. A missing table raises
    * (an artifact address for data that doesn't exist is a caller
    * bug, not a cache miss). */
  def contentStamp(s: SparkSession, dir: String, table: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir, s"$table.parquet")
    p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getFileStatus(p).getModificationTime
  }

  /** Sweep superseded content-stamp generations: deletes every
    * sibling of `keep` under its parent whose name shares `prefix`
    * but is not `keep` itself — the bpeTrain-cache discipline for
    * on-disk artifacts, so re-derived corpora don't accumulate
    * abandoned model directories without bound. */
  def sweepSuperseded(s: SparkSession, keep: String, prefix: String): Unit = {
    val keepPath = new org.apache.hadoop.fs.Path(keep)
    val fs = keepPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val parent = keepPath.getParent
    if (fs.exists(parent))
      fs.listStatus(parent).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith(prefix) && name != keepPath.getName)
          fs.delete(st.getPath, true)
      }
  }
}
