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

  require(Seq(leftTime.dataType, rightTime.dataType).forall(
    dt => dt == TimestampType || dt == LongType),
    s"as-of time must be timestamp/long, got ${leftTime.dataType}/${rightTime.dataType}")

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
        val key = rKeyProj(row)
        // SQL join semantics: a NULL key never equals anything, and a
        // NULL right time satisfies no `rt <= lt` predicate — such
        // rows are unmatchable and must not enter the index (a NULL
        // time mapped to -infinity would act as a universal fallback
        // match, silently wrong)
        val tv = boundRTime.eval(row)
        if (!key.anyNull && tv != null) {
          val k = key.copy()
          var slot = index.get(k)
          if (slot == null) {
            slot = (new scala.collection.mutable.ArrayBuffer[Long](),
              new scala.collection.mutable.ArrayBuffer[InternalRow]())
            index.put(k, slot)
          }
          slot._1 += tv.asInstanceOf[Long]
          slot._2 += row.copy()
        }
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
        val lKey = lKeyProj(lRow)
        // NULL left key or NULL left time: no row qualifies (SQL
        // comparison semantics) — left-outer NULL fill
        val slot = if (lKey.anyNull) null else index.get(lKey)
        val rMatch: InternalRow =
          if (slot == null) nullRight
          else {
            val tv = boundLTime.eval(lRow)
            if (tv == null) nullRight
            else {
              val t = tv.asInstanceOf[Long]
              // binary search: last index with times(i) <= t
              val times = slot._1
              var lo = 0; var hi = times.length - 1; var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
              }
              if (ans < 0) nullRight else slot._2(ans)
            }
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
    // the aliased select mints fresh exprIds for every column, so one
    // pass suffices — but a shared id with the left side would produce
    // silently-wrong binding, so verify rather than assume
    val rPlan = DatasetBridge.planOf(rightFresh)
    require(rPlan.outputSet.intersect(lPlan.outputSet).isEmpty,
      "as-of join sides share attribute ids after re-aliasing")
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    // cross-side type agreement: mismatched key types hash-partition
    // differently (equal values land in different zipped partitions)
    // and a timestamp/long time mismatch compares micros to raw longs
    keys.foreach { kcol =>
      val (lt, rt) = (resolve(lPlan, kcol).dataType, resolve(rPlan, kcol).dataType)
      require(lt == rt, s"as-of key '$kcol' type mismatch: $lt vs $rt")
    }
    require(resolve(lPlan, leftTimeCol).dataType == resolve(rPlan, rightTimeCol).dataType,
      s"as-of time type mismatch: ${resolve(lPlan, leftTimeCol).dataType} vs " +
        s"${resolve(rPlan, rightTimeCol).dataType}")
    val node = AsOfJoinPlan(lPlan, rPlan,
      keys.map(resolve(lPlan, _)), keys.map(resolve(rPlan, _)),
      resolve(lPlan, leftTimeCol), resolve(rPlan, rightTimeCol))
    DatasetBridge.ofRows(spark, node)
  }
}
