package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: multi-table random-hyperplane LSH
  * buckets of a FLOAT embedding — `tables` longs, each packing `bits`
  * sign-bits of deterministic hyperplane dot products.
  *
  * Why an expression and not column algebra: the composable
  * formulation needs either (a) posexplode + groupBy — which pushes
  * |corpus|×dims rows through a shuffle just to sum per-row products
  * (a 2.5 TB exchange for 10⁹ docs × 128 dims that this kernel does
  * for free in the scan), or (b) `bits×tables` interpreted
  * higher-order folds per row — Catalyst lambda evaluation is not
  * codegen'd, measured ~1.6× slower end-to-end than even the shuffle
  * variant. This kernel is one fused primitive loop over the raw
  * `ArrayData` float buffer: map-side, codegen'd, zero shuffle — the
  * same signature-is-row-local argument as [[graft.ops.Dedup.simhashes]].
  *
  * Hyperplane coefficients are derived deterministically from
  * (dimension, plane) via splitmix64 — identical on every executor
  * with nothing broadcast, memoized per (planes, dims) so the hot
  * loop reads a flat double matrix.
  */
case class HyperplaneBucketsExpr(child: Expression, bits: Int, tables: Int)
  extends UnaryExpression {
  require(bits >= 1 && bits <= 63 && tables >= 1)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_buckets expects array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    HyperplaneBuckets.compute(a.asInstanceOf[ArrayData], bits, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => s"""
      |${ev.value} = graft.functions.HyperplaneBuckets.compute($x, $bits, $tables);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : HyperplaneBucketsExpr = copy(child = newChild)
}

object HyperplaneBuckets {
  /** Column API: `HyperplaneBuckets($"emb", bits, tables)` →
    * array<long> of `tables` bucket ids. */
  def apply(emb: Column, bits: Int, tables: Int): Column =
    GraftBridge.column(HyperplaneBucketsExpr(
      GraftBridge.expression(emb), bits, tables))

  // coefficient matrices are tiny (planes × dims doubles) and pure
  // functions of their key — memoized per executor, not broadcast
  private val cache = new ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** coeff(p)(i) ∈ [-1, 1), deterministic in (p, i). */
  private def coeffs(planes: Int, dims: Int): Array[Array[Double]] =
    cache.computeIfAbsent((planes, dims), { _ =>
      Array.tabulate(planes, dims) { (p, i) =>
        splitmix64(p.toLong * 1000003L + i).toDouble / Long.MaxValue.toDouble
      }
    })

  /** The per-row kernel (also called from generated code). Returns
    * null for an empty array or any null element — a corrupt row must
    * surface as null downstream, not silently bucket as if the
    * missing dims were 0.0 (this expression is reachable from
    * arbitrary user data via the SQL `hyperplane_buckets`). */
  def compute(arr: ArrayData, bits: Int, tables: Int): ArrayData = {
    val dims = arr.numElements()
    if (dims == 0) return null
    var c = 0
    while (c < dims) {
      if (arr.isNullAt(c)) return null
      c += 1
    }
    val planes = bits * tables
    val coef = coeffs(planes, dims)
    val out = new Array[Long](tables)
    var tb = 0
    while (tb < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val c = coef(tb * bits + b)
        var dot = 0.0
        var i = 0
        while (i < dims) { dot += arr.getFloat(i).toDouble * c(i); i += 1 }
        if (dot > 0.0) bucket |= (1L << b)
        b += 1
      }
      out(tb) = bucket
      tb += 1
    }
    new GenericArrayData(out)
  }
}
