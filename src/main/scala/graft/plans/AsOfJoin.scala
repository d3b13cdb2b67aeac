package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A whole-operator Catalyst extension (SURVEY build-plan option (c):
  * LogicalPlan + SparkStrategy + SparkPlan): the as-of join Spark lacks —
  * for every left row, the single latest right row with
  * rightTime <= leftTime on matching keys (left outer semantics).
  *
  * Execution shape, chosen for 100 TB: both sides hash-partition on the
  * join key and sort by (key, time) — exactly a sort-merge join's
  * requirements, satisfied by EnsureRequirements with real exchanges —
  * then a single forward pass per partition matches every left row
  * against a one-row rolling right state. No window over a combined
  * union (the q18 formulation), no per-key buffering of right history,
  * no time-range blowup: O(|L|+|R|) per partition with O(1) state.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long] = None,
    direction: String = "backward") extends BinaryNode {
  require(Seq("backward", "forward", "nearest").contains(direction),
    s"unknown as-of direction: $direction")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long],
    direction: String,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition like a sort-merge join; EnsureRequirements inserts the
  // exchanges + sorts
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val tol = toleranceMicros
    val keyTypes = lKeys.map(_.dataType)
    val timeType = lTime.dataType
    val allOutput = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(allOutput, allOutput)
      val nullRight = new GenericInternalRow(rOutput.size)
      val joined = new JoinedRow

      val rBuf = rIter.buffered

      if (direction == "forward") {
        // forward direction: for each left row, the EARLIEST right row
        // with rightTime >= leftTime on the key. Left times ascend, so
        // right rows skipped here (key behind, or time strictly before
        // this left time) are dead for every later left row too — the
        // match is simply the right head after advancing, and it is NOT
        // consumed (the same right row may be the next-event for several
        // left rows).
        lIter.map { lRow =>
          val lKey = lKeyProj(lRow)
          val lT = lTimeProj(lRow).copy()
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            val cmp = keyOrd.compare(rKey, lKey)
            if (cmp < 0) { rBuf.next() }
            else if (cmp == 0 && timeOrd.compare(rTimeProj(rBuf.head), lT) < 0) { rBuf.next() }
            else advancing = false
          }
          val matched = rBuf.hasNext &&
            keyOrd.compare(rKeyProj(rBuf.head), lKey) == 0 &&
            // tolerance bound: match must not be further ahead than the
            // window (long-backed time types only)
            tol.forall(t => rTimeProj(rBuf.head).getLong(0) - lT.getLong(0) <= t)
          resultProj(joined(lRow, if (matched) rBuf.head else nullRight))
        }
      } else if (direction == "nearest") {
        // nearest: the backward rolling state and the forward head are
        // BOTH available after the same advance loop (rows at or before
        // the left time are consumed into the rolling state, leaving the
        // head strictly after it), so picking the closer of the two stays
        // one pass with O(1) state. Ties go backward (the pandas
        // convention); tolerance bounds both directions.
        var lastMatch: InternalRow = null
        var lastMatchKey: InternalRow = null
        var lastMatchTime = 0L

        lIter.map { lRow =>
          val lKey = lKeyProj(lRow)
          val lT = lTimeProj(lRow).copy()
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            val cmp = keyOrd.compare(rKey, lKey)
            if (cmp < 0) { rBuf.next() }
            else if (cmp == 0 && timeOrd.compare(rTimeProj(rBuf.head), lT) <= 0) {
              lastMatchKey = rKey.copy()
              lastMatchTime = rTimeProj(rBuf.head).getLong(0)
              lastMatch = rBuf.next().copy()
            } else advancing = false
          }
          val lMicros = lT.getLong(0)
          val backOk = lastMatch != null && lastMatchKey != null &&
            keyOrd.compare(lastMatchKey, lKey) == 0 &&
            tol.forall(t => lMicros - lastMatchTime <= t)
          val fwdOk = rBuf.hasNext &&
            keyOrd.compare(rKeyProj(rBuf.head), lKey) == 0 &&
            tol.forall(t => rTimeProj(rBuf.head).getLong(0) - lMicros <= t)
          val pick =
            if (backOk && fwdOk) {
              val backDelta = lMicros - lastMatchTime
              val fwdDelta = rTimeProj(rBuf.head).getLong(0) - lMicros
              if (backDelta <= fwdDelta) lastMatch else rBuf.head
            } else if (backOk) lastMatch
            else if (fwdOk) rBuf.head
            else nullRight
          resultProj(joined(lRow, pick))
        }
      } else {
        var lastMatch: InternalRow = null
        var lastMatchKey: InternalRow = null
        var lastMatchTime = 0L

        lIter.map { lRow =>
          val lKey = lKeyProj(lRow)
          val lT = lTimeProj(lRow).copy()
          // consume right rows that are (a) on earlier keys or (b) on this
          // key with time <= left time; the latest such row is the match
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            val cmp = keyOrd.compare(rKey, lKey)
            if (cmp < 0) { rBuf.next() }
            else if (cmp == 0 && timeOrd.compare(rTimeProj(rBuf.head), lT) <= 0) {
              lastMatchKey = rKey.copy()
              lastMatchTime = rTimeProj(rBuf.head).getLong(0)
              lastMatch = rBuf.next().copy()
            } else advancing = false
          }
          val matched = lastMatch != null && lastMatchKey != null &&
            keyOrd.compare(lastMatchKey, lKey) == 0 &&
            // tolerance bound: match must not be older than the window
            // (long-backed time types only: timestamp micros / long)
            tol.forall(t => lT.getLong(0) - lastMatchTime <= t)
          resultProj(joined(lRow, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

/** Optimizer rule (the Rule[LogicalPlan] extension point): Catalyst's
  * PushDownPredicates won't push through a node it doesn't know, so a
  * Filter above AsOfJoinPlan would evaluate after the join and the
  * predicate would never reach the parquet scan. An as-of join emits
  * exactly one row per left row (left-preserving, no multiplication), so
  * any conjunct referencing only left-side attributes commutes with the
  * join; right-referencing conjuncts stay above (right columns are
  * null-extended, same as outer-join pushdown rules).
  */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol, dir) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, dir, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {
  /** Left as-of join: every `left` row plus the latest `right` row with
    * `rightTime <= leftTime` on equal keys (right columns null when no
    * such row). Column names must be disjoint across the two sides.
    *
    * Names are resolved here against the analyzed children (the node is
    * injected post-analysis, so the analyzer never visits it). */
  /** @param toleranceMicros reject matches older than this many
    *   microseconds before the left time (pandas merge_asof tolerance);
    *   None = unbounded lookback. Time columns must be long-backed
    *   (timestamp / long) when a tolerance is set.
    * @param forward pandas merge_asof direction='forward': match the
    *   EARLIEST right row with rightTime >= leftTime instead of the
    *   latest at-or-before; tolerance then bounds the look-AHEAD. Same
    *   single-pass merge, same O(1) state. */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      toleranceMicros: Option[Long] = None,
      forward: Boolean = false): DataFrame =
    asOfDirection(left, right, leftKey, rightKey, leftTime, rightTime,
      toleranceMicros, if (forward) "forward" else "backward")

  /** merge_asof direction='nearest': the closer of the latest-at-or-
    * before and earliest-at-or-after right row, ties backward. The
    * nearest pick needs BOTH time comparisons in microseconds, so time
    * columns must be long-backed (timestamp / long) even without a
    * tolerance. */
  def asOfNearest(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      toleranceMicros: Option[Long] = None): DataFrame =
    asOfDirection(left, right, leftKey, rightKey, leftTime, rightTime,
      toleranceMicros, "nearest")

  /** Multi-key variants (pandas merge_asof `by=[...]`): identical
    * semantics with the match scoped to EQUAL COMPOSITE keys. The plan
    * already carries Seq keys — co-partitioning, the (keys..., time)
    * sort and the advance loop's lexicographic key comparison are all
    * arity-generic — so this is pure API surface. */
  def asOfKeys(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      toleranceMicros: Option[Long] = None,
      forward: Boolean = false): DataFrame =
    asOfDirection(left, right, leftKeys, rightKeys, leftTime, rightTime,
      toleranceMicros, if (forward) "forward" else "backward")

  def asOfKeysNearest(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      toleranceMicros: Option[Long] = None): DataFrame =
    asOfDirection(left, right, leftKeys, rightKeys, leftTime, rightTime,
      toleranceMicros, "nearest")

  private def asOfDirection(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      toleranceMicros: Option[Long],
      direction: String): DataFrame =
    asOfDirection(left, right, Seq(leftKey), Seq(rightKey), leftTime, rightTime,
      toleranceMicros, direction)

  private def asOfDirection(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      toleranceMicros: Option[Long],
      direction: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
    }
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"asOf: key arity mismatch (${leftKeys.size} left vs ${rightKeys.size} right)")
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Expression =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asOf: column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))
    val lTimeE = attr(lPlan, leftTime)
    val rTimeE = attr(rPlan, rightTime)
    // backward/forward without tolerance only ORDER times (any ordered
    // type works); nearest and any tolerance SUBTRACT them via
    // getLong(0), which reads garbage for non-long-backed types (string,
    // decimal, int-backed date) instead of failing — enforce here, at
    // plan construction, where the user sees a real error message
    if (direction == "nearest" || toleranceMicros.isDefined) {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      for (e <- Seq(lTimeE, rTimeE)) {
        val ok = e.dataType == LongType || e.dataType == TimestampType ||
          e.dataType == TimestampNTZType
        require(ok, s"asOf: direction='nearest' and tolerance need a " +
          s"long-backed time column (timestamp / long); got ${e.dataType} " +
          s"for '${e.sql}'")
      }
    }
    val plan = AsOfJoinPlan(lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      lTimeE, rTimeE, toleranceMicros, direction)
    GraftSqlBridge.ofRows(spark, plan)
  }
}
