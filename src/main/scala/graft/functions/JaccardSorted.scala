package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Exact Jaccard similarity of two SORTED DISTINCT long arrays in one
  * allocation-free merge walk — the hot inner operation of every
  * MinHash verify stage (27.3M candidate pairs x ~200-element shingle
  * sets at sf10). Replaces
  *   size(array_intersect(a, b)) / size(array_union(a, b))
  * which builds two hash sets AND materializes two result arrays per
  * pair (r14 ProfileD34: ~1,280 CPU-s per cluster-family query at
  * sf10). Value-identical to the set formulation whenever both inputs
  * are sorted and duplicate-free — the shingle-hash producers
  * (ShingleHashes, portableShingleHashes) are distinct by construction
  * and the verify stage sorts once per DOCUMENT side (sort_array over
  * 500k rows), not per pair.
  *
  * Contract notes:
  *  - inputs MUST be sorted ascending and distinct; unsorted input
  *    silently undercounts the intersection (documented, not checked —
  *    a per-pair sortedness scan would cost the walk it saves).
  *  - both empty: returns 0.0, where the SQL formulation's 0/0 raises
  *    under ANSI — a totality improvement on inputs the signature
  *    pipeline's size(wh) >= 3 guard already excludes.
  */
object JaccardSortedImpl {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    var union = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      union += 1
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    union += (n - i) + (m - j)
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }
}

case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {
  // containsNull=true is REJECTED, not tolerated: the merge walk reads
  // elements with ArrayData.getLong, which silently yields 0 for a null
  // slot and would corrupt the similarity instead of failing (r15 ADVICE).
  // Failing at analysis time costs nothing in the hot walk; producers
  // type non-null (ShingleHashes natively; portableShingleHashes via its
  // typing coalesce).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "jaccard_sorted requires element-non-null arrays " +
            "(containsNull=false): a null element would be read as 0 by the " +
            "merge walk and silently corrupt the similarity")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaccard_sorted expects (array<bigint>, array<bigint>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSortedImpl.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[JaccardSortedImpl.type].getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$m.jaccard($a, $b)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaccard_sorted"
}
