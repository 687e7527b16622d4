package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, InterpretedOrdering, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF join as a first-class operator — the full custom-operator path
  * (SURVEY §7.3 option (c)): LogicalPlan node + Strategy + physical
  * operator.
  *
  * Semantics: for every left row, attach the single right row with the
  * same key and the greatest time <= the left row's time (inclusive), or
  * nulls if none — `ASOF LEFT JOIN ... ON l.key = r.key AND
  * l.time >= r.time` in engines with the operator natively.
  *
  * Physical algorithm: both sides hash-partitioned on the key
  * (ClusteredDistribution -> co-partitioning enforced by the planner),
  * partitions sorted by (key, time) (requiredChildOrdering -> SortExec
  * inserted automatically), then a streaming merge walks both sorted
  * iterators holding only the current best right row — shuffle O(rows),
  * memory O(1) per task. That shape survives a 1000-executor 100 TB run;
  * the window-function composition (graft.ops.Joins j5, same semantics)
  * is the cross-check along with DuckDB's native ASOF JOIN oracle.
  *
  * Time columns must be timestamp/long (compared on their internal long
  * representation); keys may be any orderable type.
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending) :: SortOrder(leftTime, Ascending) :: Nil,
        SortOrder(rightKey, Ascending) :: SortOrder(rightTime, Ascending) :: Nil)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeyExpr = leftKey
    val lTimeExpr = leftTime
    val rKeyExpr = rightKey
    val rTimeExpr = rightTime
    val keyType = leftKey.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key, time) extracted into a 2-col unsafe row per side
      val lProj = UnsafeProjection.create(Seq(lKeyExpr, lTimeExpr), lOut)
      val rProj = UnsafeProjection.create(Seq(rKeyExpr, rTimeExpr), rOut)
      val keyOrd = new InterpretedOrdering(
        SortOrder(org.apache.spark.sql.catalyst.expressions.BoundReference(0, keyType, nullable = true),
                  Ascending) :: Nil)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight: InternalRow = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        private var curKey: InternalRow = null // 2-col (key, time) row of the key owner
        private var best: InternalRow = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lkRaw = lProj(l)
          // SQL ASOF semantics (DuckDB): NULL keys/times never match —
          // a null left key or time emits the null-extended right side.
          if (lkRaw.isNullAt(0) || lkRaw.isNullAt(1))
            return resultProj(joined(l, nullRight))
          val time = lkRaw.getLong(1)
          if (curKey == null || keyOrd.compare(lkRaw, curKey) != 0) {
            curKey = lkRaw.copy()
            best = null
            var done = false
            while (!done && rBuf.hasNext) {
              val rk = rProj(rBuf.head)
              // null right key/time rows can never be "as of" anything
              if (rk.isNullAt(0) || rk.isNullAt(1)) rBuf.next()
              else if (keyOrd.compare(rk, curKey) < 0) rBuf.next()
              else done = true
            }
          }
          var done = false
          while (!done && rBuf.hasNext) {
            val rk = rProj(rBuf.head)
            if (rk.isNullAt(0) || rk.isNullAt(1)) rBuf.next()
            else if (keyOrd.compare(rk, curKey) == 0 && rk.getLong(1) <= time) {
              best = rBuf.next().copy()
            } else done = true
          }
          val r = if (best != null) best else nullRight
          resultProj(joined(l, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: push left-side-only filters below the as-of join.
  * Catalyst cannot see through a foreign logical node, so without this a
  * `WHERE` on probe columns runs after the join — at scale that is the
  * difference between shuffling the filtered probe set and the whole
  * table. A left-side filter cannot change which right row is "as of"
  * for the surviving rows, so the rewrite is semantics-preserving.
  */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoin)
        if cond.references.subsetOf(a.left.outputSet) && cond.deterministic =>
      a.copy(left = Filter(cond, a.left))
  }
}

object AsOfJoinApi {
  /** DataFrame API for the operator. Key columns may be any orderable
    * type; time columns must be timestamp (or long). Injects AsOfStrategy
    * into the session on first use.
    */
  def asofJoin(spark: SparkSession, leftDf: DataFrame, rightDf: DataFrame,
               leftKeyCol: String, leftTimeCol: String,
               rightKeyCol: String, rightTimeCol: String): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${p.output.map(_.name)}"))
    val lKey = attr(lPlan, leftKeyCol); val rKey = attr(rPlan, rightKeyCol)
    val lTime = attr(lPlan, leftTimeCol); val rTime = attr(rPlan, rightTimeCol)
    // Type-strict by contract: the physical merge compares times on their
    // internal long representation and the node propagates the right-side
    // time attribute unchanged, so mixed LTZ/NTZ (or long-vs-timestamp)
    // inputs would silently mix epochs/types in the output. Refuse instead.
    require(lTime.dataType == rTime.dataType,
      s"as-of time columns must share one type; got left $leftTimeCol: ${lTime.dataType}, " +
        s"right $rightTimeCol: ${rTime.dataType} — cast one side before joining")
    require(lKey.dataType == rKey.dataType,
      s"as-of key columns must share one type; got left $leftKeyCol: ${lKey.dataType}, " +
        s"right $rightKeyCol: ${rKey.dataType}")
    val node = AsOfJoin(lPlan, rPlan, lKey, rKey, lTime, rTime)
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark, node)
  }
}
