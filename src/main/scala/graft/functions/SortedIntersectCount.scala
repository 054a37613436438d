package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: |A ∩ B| of two ASC-SORTED, DISTINCT,
  * null-free BIGINT arrays, as one primitive merge walk with
  * `doGenCode`.
  *
  * This is the Jaccard-verification hot path (r21): every candidate
  * pair of the near-dup family (q65/q67/q80/q92 via
  * `jaccardOfCandidates`) intersects two doc-shingle-set arrays of
  * O(10³) hashes. The built-in `size(array_intersect(a, b))` builds a
  * boxed `OpenHashSet[Any]` over one side and probes it element by
  * element PER ROW-PAIR — allocation plus Long boxing on the innermost
  * loop of an O(candidates · set size) stage (measured r21: the two
  * verification joins of q67 were ~60% of its runtime, dominated by
  * this evaluation). The merge walk reads both arrays through the
  * primitive `getLong` accessors, allocates nothing, and is the
  * textbook O(n+m) sorted-set intersection.
  *
  * Equivalence contract (spec-pinned in SortedIntersectCountSpec):
  * on arrays that are sorted ascending with distinct, non-null
  * elements, the result equals `size(array_intersect(a, b))` —
  * array_intersect preserves the left side's distinct matches, and a
  * distinct sorted merge counts exactly those. The engine's
  * doc-shingle-set artifacts guarantee the precondition by
  * construction (`sort_array(collect_set(h))`). On UNSORTED or
  * duplicate-carrying inputs the two differ — this expression is a
  * layout-aware primitive, not a general set operation; callers own
  * the sortedness invariant, exactly as a merge join owns its input
  * order. Null ARRAY on either side → null (standard BinaryExpression
  * propagation); null elements are outside the contract.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> inputs, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx, ev,
      (a, b) => s"""
        |int ${ev.value}_nx = $a.numElements();
        |int ${ev.value}_ny = $b.numElements();
        |int ${ev.value}_i = 0;
        |int ${ev.value}_j = 0;
        |long ${ev.value}_c = 0L;
        |while (${ev.value}_i < ${ev.value}_nx && ${ev.value}_j < ${ev.value}_ny) {
        |  long ${ev.value}_xv = $a.getLong(${ev.value}_i);
        |  long ${ev.value}_yv = $b.getLong(${ev.value}_j);
        |  if (${ev.value}_xv == ${ev.value}_yv) {
        |    ${ev.value}_c++; ${ev.value}_i++; ${ev.value}_j++;
        |  } else if (${ev.value}_xv < ${ev.value}_yv) {
        |    ${ev.value}_i++;
        |  } else {
        |    ${ev.value}_j++;
        |  }
        |}
        |${ev.value} = ${ev.value}_c;
      """.stripMargin,
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
