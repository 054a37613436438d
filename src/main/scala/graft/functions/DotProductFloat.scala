package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two numeric arrays with
  * double accumulation, fused into a single loop with `doGenCode`.
  * Each side may independently be array<float> or array<double> — the
  * corpus embeddings are float (TESTDATA dim 64); trained IVF centroids
  * are double (element-wise means), and the assignment loop dots one
  * against the other.
  *
  * This is the one hot-path primitive where the built-in composition
  * (`zip_with` to build a products array, then `aggregate` to fold it)
  * pays a real tax: an intermediate ArrayData allocation plus two
  * higher-order-function lambda frames PER ROW, on the innermost loop
  * of every ANN scan (corpus × queries × 64 multiplies). The fused
  * loop allocates nothing and stays inside whole-stage codegen.
  *
  * Semantics match the built-in composition on equal-length inputs —
  * elements promoted to double before multiplication, accumulated
  * left-to-right — which is also DuckDB list_dot_product's order, so
  * oracle hash-matches are unaffected. On MISMATCHED lengths the two
  * differ: this expression uses the common prefix, while the zip_with
  * composition pads with nulls and returns NULL. The engine's
  * embedding contract is fixed-dimension dense arrays, where the cases
  * coincide; null ELEMENTS are not supported either way. Null array →
  * null (standard BinaryExpression propagation).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float|double> inputs, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot_f"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = elemType(left) == FloatType
    val yf = elemType(right) == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xi * yi
      i += 1
    }
    s
  }

  private def genGet(arr: String, dt: DataType, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx, ev,
      (a, b) => s"""
        |int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double ${ev.value}_s = 0.0;
        |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
        |  ${ev.value}_s += ${genGet(a, elemType(left), s"${ev.value}_i")}
        |    * ${genGet(b, elemType(right), s"${ev.value}_i")};
        |}
        |${ev.value} = ${ev.value}_s;
      """.stripMargin,
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}
