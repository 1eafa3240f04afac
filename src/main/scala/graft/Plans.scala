package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Plan dump for the optimization rounds: writes `.explain("formatted")`
  * output for named registry queries to files, one per query, under the
  * same session config the bench uses — so the committed before/after
  * plan artifacts (plans/rNN/<query>_{before,after}.txt) describe the
  * exact plans the bench times. Usage:
  *   sbt "runMain graft.Plans <outDir> <suffix> [name,name,...]"
  * (no names = every registry query).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val (outDir, suffix, only) = args match {
      case Array(a, b)    => (a, b, None)
      case Array(a, b, f) => (a, b, Some(f.split(",").filter(_.nonEmpty).toSet))
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // same pre-built artifacts as Bench: the plans must describe the
    // artifact-served reads the bench times, not inline rebuilds
    try graft.ops.Similarity.ensureIvfIndex(spark, sfDir) catch { case _: Throwable => }
    try graft.ops.Similarity.ensureSemanticIndex(spark, sfDir) catch { case _: Throwable => }
    try graft.ops.Similarity.ensureCodebook(spark, sfDir) catch { case _: Throwable => }
    try graft.ops.Similarity.ensureTrainedIvfIndex(spark, sfDir) catch { case _: Throwable => }
    try graft.ops.TextAnalysis.ensureBpeModel(spark, sfDir) catch { case _: Throwable => }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        } catch { case e: Throwable =>
          System.err.println(s"[plans] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
