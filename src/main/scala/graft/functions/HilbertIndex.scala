package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the order-16 Hilbert curve index of a
  * point on the 65536×65536 grid (inputs are the [[graft.ops.Layout]]
  * 16-bit quantized dimensions).
  *
  * The Hilbert transform is a 16-level loop whose per-level reflect/
  * swap depends on the level's quadrant bits — expressed as chained
  * `when()` columns each level would re-materialize (x, y) twice per
  * stage and lean on CollapseProject's duplicate-expression guards;
  * as a kernel it is sixteen iterations of three longs in a register
  * loop (the "custom Expression beats UDF" rung of the builder
  * brief, same as [[CosineSimilarityExpr]]). The DuckDB oracle runs
  * the IDENTICAL staged arithmetic as sixteen generated CTE stages
  * (see SparkEntry.l02OracleSql), so the kernel is certified
  * cross-engine at every gate run. The spec pins it three ways: a
  * classic n/2-descent model (NOTE: same recurrence re-expressed —
  * a shared misreading of the recurrence would pass both), FIXED
  * published corner constants of the standard curve ((0,0)→0,
  * (n−1,0)→n²−1, and the base-4 repunit corners (0,n−1)→(n²−1)/3,
  * (n−1,n−1)→2(n²−1)/3 — external values no shared bug can
  * reproduce), and the adjacency/permutation property on a full
  * sub-lattice, which only a genuine Hilbert curve satisfies.
  *
  * Level semantics (top bit k=15 down to 0, n=65536):
  *   rx = (x >> k) & 1;  ry = (y >> k) & 1
  *   d += 4^k · (3·rx + ry − 2·rx·ry)      // == (3rx) XOR ry
  *   if ry == 0: { if rx == 1: x = n−1−x; y = n−1−y }; swap(x, y)
  *
  * Inputs outside [0, 65535] are masked to their low 16 bits (the
  * quantizer never produces them; masking keeps the kernel total).
  */
case class HilbertIndexExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert_index expects (bigint, bigint), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long] & 0xFFFFL
    var y = b.asInstanceOf[Long] & 0xFFFFL
    var d = 0L
    var k = 15
    while (k >= 0) {
      val rx = (x >> k) & 1L
      val ry = (y >> k) & 1L
      d += (1L << (2 * k)) * (3L * rx + ry - 2L * rx * ry)
      if (ry == 0L) {
        if (rx == 1L) { x = 65535L - x; y = 65535L - y }
        val t = x; x = y; y = t
      }
      k -= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val k = ctx.freshName("hk")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a & 0xFFFFL;
         |long $y = $b & 0xFFFFL;
         |long $d = 0L;
         |for (int $k = 15; $k >= 0; $k--) {
         |  long $rx = ($x >> $k) & 1L;
         |  long $ry = ($y >> $k) & 1L;
         |  $d += (1L << (2 * $k)) * (3L * $rx + $ry - 2L * $rx * $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = 65535L - $x; $y = 65535L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Column API: `HilbertIndex($"qa", $"qb")`. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(HilbertIndexExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
