package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarityExpr, HyperplaneBucketsExpr, MinHashSigExpr, SimHashExpr}

/** Session-extension hook: registers the engine's native expressions
  * into the SQL function registry, so `spark.sql("SELECT
  * cosine_similarity(a, b) ...")` works cluster-wide via
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_similarity"),
      GraftExtensions.cosineBuilder))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBucketsExpr].getName, "hyperplane_buckets"),
      GraftExtensions.bucketsBuilder))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      GraftExtensions.minhashBuilder))
    ext.injectFunction((
      FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash"),
      GraftExtensions.simhashBuilder))
  }
}

object GraftExtensions {
  // builder validation throws AnalysisException (via the bridge — the
  // message constructor is private[sql]) so SQL callers get a
  // positioned analysis error, not a raw IllegalArgumentException
  // escaping function resolution
  private def analysisError(msg: String): Nothing =
    throw org.apache.spark.sql.GraftBridge.analysisException(msg)

  private val cosineBuilder: Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 2)
      analysisError(s"cosine_similarity(a, b) takes two arguments; got ${exprs.length}")
    CosineSimilarityExpr(exprs(0), exprs(1))
  }

  private val bucketsBuilder: Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 3)
      analysisError(
        s"hyperplane_buckets(emb, bits, tables) takes three arguments; got ${exprs.length}")
    def intLit(e: Expression, name: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => analysisError(
        s"hyperplane_buckets: $name must be an integer literal, got ${other.sql}")
    }
    val bits = intLit(exprs(1), "bits")
    val tables = intLit(exprs(2), "tables")
    if (bits < 1 || bits > 63 || tables < 1)
      analysisError(
        s"hyperplane_buckets: bits must be in [1, 63] and tables >= 1; got bits=$bits, tables=$tables")
    HyperplaneBucketsExpr(exprs(0), bits, tables)
  }

  private val minhashBuilder: Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 2)
      analysisError(
        s"minhash_sig(hashes, num_hashes) takes two arguments; got ${exprs.length}")
    val n = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => analysisError(
        s"minhash_sig: num_hashes must be an integer literal, got ${other.sql}")
    }
    if (n < 1)
      analysisError(s"minhash_sig: num_hashes must be >= 1; got $n")
    MinHashSigExpr(exprs(0), n)
  }

  private val simhashBuilder: Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 1)
      analysisError(s"simhash(token_hashes) takes one argument; got ${exprs.length}")
    SimHashExpr(exprs(0))
  }

  /** Register into an already-running session (tests, spark-shell). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "cosine_similarity", cosineBuilder)
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "hyperplane_buckets", bucketsBuilder)
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "minhash_sig", minhashBuilder)
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "simhash", simhashBuilder)
  }
}
