package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native signature kernels for the dedup sketches. Both replace
  * per-element Catalyst higher-order lambdas (ArrayTransform /
  * ArrayAggregate are interpreted, not codegen'd — measured ~5×
  * slower than a fused JVM loop at 64 hash families per element)
  * with one pass over the raw `ArrayData` long buffer. Both stay
  * map-side: a signature depends only on its own row, so the stage
  * fuses into the scan projection with zero shuffle.
  */

/** MinHash signature of a shingle-hash set: `array<long>` of
  * `numHashes` minima, value-identical FOR NULL-FREE ARRAYS to the
  * composable `array_min(transform(hs, h => xxhash64(lit(i), h)))`
  * formulation — the kernel replays Spark's own XXH64 chain (seed 42
  * → hashInt(i) → hashLong(h)), so on clean input swapping
  * formulations changes no signature bit (FunctionsSpec asserts
  * equality). Null ELEMENTS diverge deliberately: the kernel returns
  * null (corrupt row surfaces downstream, same contract as
  * [[HyperplaneBuckets.compute]]), whereas Spark's hash functions
  * skip null inputs and the composable form would silently sign the
  * remaining elements. Dedup's shingle pipeline never produces null
  * elements, so the scale paths see only the identical regime. */
case class MinHashSigExpr(child: Expression, numHashes: Int)
  extends UnaryExpression {
  require(numHashes >= 1)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<long>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any =
    MinHashSig.compute(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => s"""
      |${ev.value} = graft.functions.MinHashSig.compute($x, $numHashes);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSigExpr = copy(child = newChild)
}

object MinHashSig {
  def apply(hs: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(hs), numHashes))

  // per-permutation seeds replay xxhash64's multi-arg chain:
  // xxhash64(lit(i), h) = hashLong(h, hashInt(i, 42))
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def seeds(n: Int): Array[Long] =
    seedCache.computeIfAbsent(n,
      _ => Array.tabulate(n)(i => XXH64.hashInt(i, 42L)))

  /** The per-row kernel (also called from generated code). Returns
    * null for an empty array or any null element: an empty shingle
    * set has no minimum (`array_min` of an empty array is null —
    * emitting Long.MaxValue sentinels instead would make every empty
    * doc band-collide with every other), and a null element marks a
    * corrupt row that must surface rather than hash as garbage.
    * `element_at` on the null array yields null per signature column,
    * matching the composable formulation's per-column nulls. */
  def compute(hs: ArrayData, numHashes: Int): ArrayData = {
    val m = hs.numElements()
    if (m == 0) return null
    var c = 0
    while (c < m) {
      if (hs.isNullAt(c)) return null
      c += 1
    }
    val sd = seeds(numHashes)
    val out = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val h = hs.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashLong(h, sd(i))
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** 64-bit SimHash from a token-hash array: per-bit majority votes in
  * one fused pass — value-identical to the composable 64×
  * `aggregate(hs, 0L, acc + shiftright(h, i) & 1)` + threshold
  * formulation (FunctionsSpec asserts equality). */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash expects array<long>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (SimHash.hasNullElement(arr)) null else SimHash.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => s"""
      |if (graft.functions.SimHash.hasNullElement($x)) { ${ev.isNull} = true; }
      |else { ${ev.value} = graft.functions.SimHash.compute($x); }
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : SimHashExpr = copy(child = newChild)
}

object SimHash {
  def apply(tokenHashes: Column): Column =
    GraftBridge.column(SimHashExpr(GraftBridge.expression(tokenHashes)))

  /** Null-element guard: a corrupt row surfaces as null rather than
    * voting with garbage bits (empty arrays are fine — all-zero votes
    * yield simhash 0, identical to the composable folds). */
  def hasNullElement(hs: ArrayData): Boolean = {
    val m = hs.numElements()
    var i = 0
    while (i < m) {
      if (hs.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** The per-row kernel (also called from generated code). */
  def compute(hs: ArrayData): Long = {
    val votes = new Array[Int](64)
    val m = hs.numElements()
    var j = 0
    while (j < m) {
      val h = hs.getLong(j)
      var b = 0
      while (b < 64) {
        votes(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      j += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (2L * votes(b) > m) sim |= (1L << b)
      b += 1
    }
    sim
  }
}
