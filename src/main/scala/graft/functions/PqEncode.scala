package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization encoder: one fused loop per row over
  * the broadcast codebook, replacing the melt → broadcast-join →
  * argmin-aggregate → collect_list encode pipeline (two corpus-sized
  * `Sort + Exchange + SortAggregate` rounds) with ZERO exchanges.
  *
  * Inputs: `emb` array<float|double> (the vector, dim = m·w),
  * `cwflat` array<double> (the m·codebookSize codewords flattened
  * j-major then c then dim: index (j·C + c)·w + d), `norm2s`
  * array<double> (codeword norm² at j·C + c). `m` and `codebookSize`
  * are literal hyperparameters. Output:
  * struct(codes array<long>, vnorm2 double) — codes(j) is the argmin
  * codeword per subspace, vnorm2 the j-ordered sum of the selected
  * codewords' norm².
  *
  * Value-identity with the exchange formulation it replaces (the
  * s09/s18/s19 oracles pin it end to end):
  *  - the subspace distance is the SAME left-to-right double fold
  *    (acc += diff·diff in element order — the `aggregate(zip_with)`
  *    evaluation order), r4-rounded through the SAME
  *    floor(x·10000 + 0.5) → long → /10000.0 sequence as
  *    [[graft.ops.Relational.r4]] (Spark's Floor on a double yields
  *    a LONG);
  *  - argmin ties break on the LOWEST codeword id (strict `<` while
  *    iterating c ascending) — the `min(struct(d, c, …))`
  *    lexicographic contract;
  *  - vnorm2 folds in j-ascending order — the
  *    `aggregate(transform(array_sort(...)))` order.
  *
  * The r19-opt experiment priced the in-row route WITHOUT codegen
  * (interpreted `zip_with`/`aggregate` lambdas nested in a
  * `transform`/`array_min` loop): it lost ~1.5× at ×16 to the
  * lambda-bound-slice re-evaluation trap. This kernel is the
  * follow-up it queued — the per-codeword work is one compiled loop,
  * the profile where in-row wins (the seededAssign lesson).
  *
  * Null/shape contract: null if any input array is null, if any
  * SCORED element is null (corrupt row surfaces as null, the
  * [[CosineSimilarityExpr]] discipline), or if the shapes disagree
  * (emb length ≠ m·w with w = |cwflat|/(m·C), or |norm2s| ≠ m·C) —
  * callers guard dim with a raise_error filter BEFORE the kernel, so
  * a null here is a programming error surfacing visibly, not a
  * silently-degraded code. */
case class PqEncodeExpr(first: Expression, second: Expression,
    third: Expression, m: Int, codebookSize: Int)
  extends TernaryExpression {
  require(m >= 1 && codebookSize >= 1)

  private def embElem: Option[DataType] = first.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }
  private def isDoubleArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (embElem.isDefined && isDoubleArr(second) && isDoubleArr(third))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects (array<float|double>, array<double>, " +
        s"array<double>), got ${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("vnorm2", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(e: Any, cwf: Any, n2: Any): Any = {
    val embIsF = embElem.contains(FloatType)
    val emb = e.asInstanceOf[ArrayData]
    val cw = cwf.asInstanceOf[ArrayData]
    val norm2 = n2.asInstanceOf[ArrayData]
    val mc = m * codebookSize
    if (norm2.numElements() != mc || cw.numElements() % mc != 0) return null
    val w = cw.numElements() / mc
    if (emb.numElements() != m * w) return null
    val codes = new Array[Long](m)
    var vnorm2 = 0.0
    var j = 0
    while (j < m) {
      var bestD = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < codebookSize) {
        var acc = 0.0
        var d = 0
        while (d < w) {
          val ei = j * w + d
          if (emb.isNullAt(ei)) return null
          val cwi = (j * codebookSize + c) * w + d
          if (cw.isNullAt(cwi)) return null
          val ev = if (embIsF) emb.getFloat(ei).toDouble else emb.getDouble(ei)
          val diff = ev - cw.getDouble(cwi)
          acc += diff * diff
          d += 1
        }
        val dr = math.floor(acc * 10000.0 + 0.5).toLong / 10000.0
        if (dr < bestD) { bestD = dr; bestC = c }
        c += 1
      }
      val ni = j * codebookSize + bestC
      if (norm2.isNullAt(ni)) return null
      codes(j) = bestC.toLong
      vnorm2 += norm2.getDouble(ni)
      j += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), vnorm2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, cwf, n2) => {
      val embGet =
        if (embElem.contains(FloatType)) (i: String) => s"(double) $e.getFloat($i)"
        else (i: String) => s"$e.getDouble($i)"
      val mc = m * codebookSize
      val w = ctx.freshName("w")
      val codes = ctx.freshName("codes")
      val vnorm2 = ctx.freshName("vnorm2")
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val dr = ctx.freshName("dr")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val ei = ctx.freshName("ei")
      val cwi = ctx.freshName("cwi")
      val ni = ctx.freshName("ni")
      val diff = ctx.freshName("diff")
      s"""
         |boolean $bad = ($n2.numElements() != $mc) ||
         |  ($cwf.numElements() % $mc != 0);
         |int $w = $bad ? 0 : $cwf.numElements() / $mc;
         |if (!$bad && $e.numElements() != $m * $w) { $bad = true; }
         |long[] $codes = new long[$m];
         |double $vnorm2 = 0.0;
         |for (int $j = 0; $j < $m && !$bad; $j++) {
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $codebookSize && !$bad; $c++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $w && !$bad; $d++) {
         |      int $ei = $j * $w + $d;
         |      int $cwi = ($j * $codebookSize + $c) * $w + $d;
         |      if ($e.isNullAt($ei) || $cwf.isNullAt($cwi)) { $bad = true; }
         |      else {
         |        double $diff = ${embGet(ei)} - $cwf.getDouble($cwi);
         |        $acc += $diff * $diff;
         |      }
         |    }
         |    double $dr = (double)(long) java.lang.Math.floor($acc * 10000.0 + 0.5) / 10000.0;
         |    if (!$bad && $dr < $bestD) { $bestD = $dr; $bestC = $c; }
         |  }
         |  int $ni = $j * $codebookSize + $bestC;
         |  if (!$bad && $n2.isNullAt($ni)) { $bad = true; }
         |  if (!$bad) {
         |    $codes[$j] = (long) $bestC;
         |    $vnorm2 += $n2.getDouble($ni);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] {
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($codes),
         |      java.lang.Double.valueOf($vnorm2) });
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqEncodeExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqEncode {
  /** Column API: `PqEncode($"emb", $"cwflat", $"norm2s", m, c)`. */
  def apply(emb: Column, cwflat: Column, norm2s: Column, m: Int,
      codebookSize: Int): Column =
    GraftBridge.column(PqEncodeExpr(GraftBridge.expression(emb),
      GraftBridge.expression(cwflat), GraftBridge.expression(norm2s),
      m, codebookSize))
}
