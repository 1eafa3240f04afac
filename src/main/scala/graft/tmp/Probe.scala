package graft.tmp
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name min=${ts.min}%.3f")
    }
    time("d06")(graft.ops.Dedup.embeddingNearDups(spark, sf).count())
    time("s02")(graft.ops.Similarity.lshTopK(spark, sf).count())
    spark.stop()
  }
}
