package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.{LongType, TimestampType}

/** As-of join as a first-class planner operator.
  *
  * Semantics: LEFT OUTER as-of — each left row pairs with the single
  * right row having equal keys and the LARGEST right time ≤ the left
  * row's time; no qualifying right row → right columns NULL. This is
  * the reference's "latest record per key at a point in time" pattern
  * (condemned_dead_end_properties.py:66-85, integrate_new_requests
  * last-update semantics) as one operator instead of a join-to-max
  * subquery (two scans + two shuffles) or a window (full sort of the
  * union).
  *
  * Physical execution: both sides hash-clustered on the keys (one
  * shuffle each — the minimum possible), right side sorted by
  * (keys, time) per partition; each partition builds a key → sorted
  * time-array index of its right rows and binary-searches it per left
  * row. Cost: shuffle(left) + shuffle(right) + O(|right_p|) memory per
  * partition + O(log n) per probe.
  *
  * Registered via `GraftExtensions` (new sessions) or
  * `AsOfJoin.install(spark)` (live session,
  * `spark.experimental.extraStrategies`).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryNode {

  // USING-join shape: the right side's key columns are dropped from
  // the output (they equal the left keys on every matched row)
  override def output: Seq[Attribute] = {
    val rightKeyIds = rightKeys.collect { case a: Attribute => a.exprId }.toSet
    left.output ++ right.output
      .filterNot(a => rightKeyIds.contains(a.exprId))
      .map(_.withNullability(true))
  }

  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = {
    val rightKeyIds = rightKeys.collect { case a: Attribute => a.exprId }.toSet
    left.output ++ right.output
      .filterNot(a => rightKeyIds.contains(a.exprId))
      .map(_.withNullability(true))
  }

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Nil, (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  private def timeToLong(e: Expression, row: InternalRow): Long = e.dataType match {
    case TimestampType | LongType =>
      val v = e.eval(row)
      if (v == null) Long.MinValue else v.asInstanceOf[Long]
    case dt => throw new IllegalArgumentException(s"as-of time must be timestamp/long, got $dt")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output; val rOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val boundRTime = BindReferences.bindReference(rTime, rOut)
      val boundLTime = BindReferences.bindReference(lTime, lOut)

      // index this partition's right rows: key -> (times[], rows[]),
      // time-ascending because of requiredChildOrdering
      val index = new java.util.HashMap[UnsafeRow,
        (scala.collection.mutable.ArrayBuffer[Long],
          scala.collection.mutable.ArrayBuffer[InternalRow])]()
      rIter.foreach { row =>
        val key = rKeyProj(row).copy()
        var slot = index.get(key)
        if (slot == null) {
          slot = (new scala.collection.mutable.ArrayBuffer[Long](),
            new scala.collection.mutable.ArrayBuffer[InternalRow]())
          index.put(key, slot)
        }
        slot._1 += timeToLong(boundRTime, row)
        slot._2 += row.copy()
      }

      val nullRight = new GenericInternalRow(rOut.size)
      val joined    = new JoinedRow()
      // input schema of the joined row is the FULL left++right output;
      // the projection drops the right-side key columns. Right attrs
      // are bound nullable — BoundReference takes nullability from the
      // INPUT schema, and a no-match row carries nulls regardless of
      // the source column's declared nullability
      val outProj   = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))

      lIter.map { lRow =>
        val slot = index.get(lKeyProj(lRow))
        val rMatch: InternalRow =
          if (slot == null) nullRight
          else {
            val t = timeToLong(boundLTime, lRow)
            // binary search: last index with times(i) <= t
            val times = slot._1
            var lo = 0; var hi = times.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (ans < 0) nullRight else slot._2(ans)
          }
        outProj(joined(lRow, rMatch))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {

  /** Install the strategy on a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[AsOfStrategy.type]))
      spark.experimental.extraStrategies = cur :+ AsOfStrategy
  }

  /** DataFrame API: as-of join `left` to `right` on equal `keys` with
    * the largest `rightTime` ≤ `leftTime`; right columns NULL when no
    * qualifying row exists.
    */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame, keys: Seq[String],
               leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val spark = leftDf.sparkSession
    install(spark)
    val lPlan = DatasetBridge.planOf(leftDf)
    // self-join safety: both sides may share lineage (identical
    // attribute ids); re-alias the right side to fresh ids — custom
    // nodes are not covered by DeduplicateRelations
    val rightFresh = rightDf.select(
      rightDf.columns.map(c => rightDf(c).as(c)).toIndexedSeq: _*)
    val rPlan = {
      val p = DatasetBridge.planOf(rightFresh)
      if (p.outputSet.intersect(lPlan.outputSet).isEmpty) p
      else DatasetBridge.planOf(rightFresh.select(
        rightFresh.columns.map(c => rightFresh(c).as(c)).toIndexedSeq: _*))
    }
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    val node = AsOfJoinPlan(lPlan, rPlan,
      keys.map(resolve(lPlan, _)), keys.map(resolve(rPlan, _)),
      resolve(lPlan, leftTimeCol), resolve(rPlan, rightTimeCol))
    DatasetBridge.ofRows(spark, node)
  }
}
