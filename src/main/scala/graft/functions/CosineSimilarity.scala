package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float or
  * double arrays (each side independently — a float corpus scored
  * against double k-means centroids stays in the kernel).
  *
  * The composable formulation (`zip_with` + `aggregate`, see
  * [[graft.ops.Similarity.cosine]]) builds three higher-order-function
  * evaluations per row with lambda-variable binding per element; this
  * expression is one fused loop over the raw `ArrayData` float
  * buffers — the "custom Expression beats UDF beats everything"
  * rung of the builder brief, used where the similarity kernel is the
  * hot inner loop of a 100 TB ANN scoring stage.
  *
  * Null/length contract: null if either side is null OR any scored
  * element is null (a corrupt row surfaces as null instead of
  * silently scoring with 0.0 dims); mismatched lengths score over
  * the common prefix (caller guarantees equal dims in practice);
  * zero-norm inputs yield null (matches SQL division semantics
  * rather than NaN).
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elementType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elementType(e).isDefined)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float>/array<double> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  // element accessors resolved ONCE from the static child types (both
  // eval and codegen branch at plan time, not per element)
  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xIsF = elementType(left).contains(FloatType)
    val yIsF = elementType(right).contains(FloatType)
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = get(x, i, xIsF)
      val yv = get(y, i, yIsF)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      def getter(arr: String, i: String, e: Expression): String =
        if (elementType(e).contains(FloatType)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val bad = ctx.freshName("bad")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |boolean $bad = false;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; }
         |  else {
         |    double $xv = ${getter(x, i, left)};
         |    double $yv = ${getter(y, i, right)};
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |if ($bad || $denom == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column API: `CosineSimilarity($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarityExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
