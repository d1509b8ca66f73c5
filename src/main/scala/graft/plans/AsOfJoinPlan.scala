package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the full custom-operator path (logical node →
  * planner strategy → physical sort-merge exec), complementing the
  * composed union+window form in `graft.ops.AsOf`.
  *
  * Semantics: one output row per left row, carrying the right row with
  * the greatest `rightTime <= leftTime` for the same key (right columns
  * NULL when no such row).
  *
  * Physical design: both children are hash-clustered on the key and
  * sorted by (key, time) — exactly the requirements a SortMergeJoin
  * declares, so Catalyst inserts the minimal exchanges/sorts and reuses
  * existing ones. Execution is a single forward merge per partition:
  * O(|L|+|R|) with one buffered right row, no backtracking, constant
  * memory beyond the iterators. At 100 TB this behaves like a
  * sort-merge join WITHOUT the many-to-many pair blowup (each left row
  * emits exactly once).
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)) ::
      Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)) :: Nil

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable pieces (expressions, attributes); build
    // projections per partition — UnsafeProjection is not serializable
    val lKeyExpr = leftKey; val rKeyExpr = rightKey
    val lTimeExpr = leftTime; val rTimeExpr = rightTime
    val lOut = left.output; val rOut = right.output
    val allOut = output
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType
    val rightWidth = rOut.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = PhysicalDataType.ordering(keyDt)
        .asInstanceOf[Ordering[Any]]
      val timeOrd = PhysicalDataType.ordering(timeDt)
        .asInstanceOf[Ordering[Any]]
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastKey: Any = null
      var lastRight: InternalRow = null

      lIter.map { lRow =>
        val lKeyRow = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        if (lKeyRow.isNullAt(0) || lTimeRow.isNullAt(0)) {
          // SQL comparison semantics: a null key equals nothing and a
          // null time is before nothing — emit the no-match row. No
          // right-side advance: null-first sort order puts these rows
          // before every non-null left row, so the merge stays aligned.
          resultProj(joined(lRow, nullRight))
        } else {
          val lKey = lKeyRow.get(0, keyDt)
          val lTime = lTimeRow.get(0, timeDt)
          // advance the right side while it is still at-or-before (key, time)
          var continue = rHead != null
          while (continue) {
            val rKeyRow = rKeyProj(rHead)
            val rTimeRow = rTimeProj(rHead)
            if (rKeyRow.isNullAt(0) || rTimeRow.isNullAt(0)) {
              // null-keyed/timed right rows can never match any left row;
              // they sort first (nulls first) — skip past them
              rHead = if (rIter.hasNext) rIter.next() else null
              continue = rHead != null
            } else {
              val rKey = rKeyRow.get(0, keyDt)
              val cmp = keyOrd.compare(rKey, lKey)
              val beforeOrAt = cmp < 0 ||
                (cmp == 0 && timeOrd.compare(rTimeRow.get(0, timeDt), lTime) <= 0)
              if (beforeOrAt) {
                // copyValue: the projection's UnsafeRow buffer is reused
                // per call, so buffer-backed keys (strings) must be
                // deep-copied before being remembered across rows
                if (cmp == 0) {
                  lastKey = InternalRow.copyValue(rKey)
                  lastRight = rHead.copy()
                }
                rHead = if (rIter.hasNext) rIter.next() else null
                continue = rHead != null
              } else continue = false
            }
          }
          val matches = lastRight != null && lastKey != null &&
            keyOrd.compare(lastKey, lKey) == 0
          resultProj(joined(lRow, if (matches) lastRight else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the exec (inject via
  * `GraftExtensions`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoinPlan {
  /** DataFrame entry point: as-of join `left` with `right` on equal
    * `key`, matching the latest `rightTime <= leftTime`. Right-side
    * columns come back prefixed `asof_` (same convention as the composed
    * `graft.ops.AsOf.join`); the right key is dropped (it equals the
    * left key or is null). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String): DataFrame = {
    val rPrefixed = right.toDF(right.columns.map(c =>
      if (c == key) "__asof_key" else s"asof_$c").toIndexedSeq: _*)
    val lPlan = GraftSqlBridge.analyzed(left)
    val rPlan = GraftSqlBridge.analyzed(rPrefixed)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${p.output.map(_.name).mkString(",")}"))
    // make the plan executable even on sessions built without
    // GraftExtensions: the public experimental-strategies hook
    val spark = left.sparkSession
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    // the right-side key/time attributes are distinct from left's even
    // when names match (resolution by expression id)
    GraftSqlBridge.ofRows(left.sparkSession,
      AsOfJoin(lPlan, rPlan,
        attr(lPlan, key), attr(rPlan, "__asof_key"),
        attr(lPlan, leftTime), attr(rPlan, s"asof_$rightTime")))
      .drop("__asof_key")
  }
}
