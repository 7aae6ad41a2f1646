package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst extension: a native sorted-merge AS-OF join.
  *
  * This is the deepest rung of the extension ladder the engine uses —
  * below composed DataFrame ops ([[graft.operators.AsofJoin.asofBackward]])
  * and custom Expressions sits a full custom logical node + planner
  * strategy + physical operator. The logical node declares WHAT (each left
  * row gains the latest right row at-or-before its timestamp, per key);
  * the physical node tells Spark's EnsureRequirements what layout it
  * needs — both children hash-clustered on the key and sorted by
  * (key, time) — and then performs a single forward scan per partition.
  *
  * Why this exists when the window composition already works: the
  * composition pays one shuffle of left ∪ right PLUS a window sort over
  * the union; the merge exec pays the two child shuffles (which
  * EnsureRequirements elides when a side is already clustered, e.g. a
  * bucketed table or the output of an upstream aggregate on the same key)
  * and streams both sides without materializing a union. At 100 TB the
  * "right side already clustered by the upstream groupBy" case is the
  * common one — there the merge join is shuffle-free on that side while
  * the union form always re-shuffles everything.
  *
  * Semantics match `ASOF LEFT JOIN ... ON l.key = r.key AND l.t >= r.t`
  * (DuckDB/Pandas `merge_asof` backward, inclusive). Left rows with null
  * key or time, and right rows with null key/time, never match.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    carried: Seq[Attribute],
    carriedOut: Seq[Attribute]
) extends BinaryNode {
  // carriedOut are fresh attributes PRODUCED by this node (renamed copies of
  // the right-side `carried` columns). They are plain Attributes, not
  // Aliases, because the analyzer's CleanupAliases strips Alias from every
  // non-Project/Aggregate operator's expressions.
  override def output: Seq[Attribute] = left.output ++ carriedOut
  override def producedAttributes: AttributeSet = AttributeSet(carriedOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] as [[AsofMergeJoinExec]]. Registered per-session
  * via `experimental.extraStrategies` (idempotently, by the API entry
  * point) or globally through [[graft.GraftExtensions]].
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, carried, carriedOut) =>
      AsofMergeJoinExec(lk, rk, lt, rt, carried, carriedOut, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical sorted-merge as-of join.
  *
  * Layout contract (declared, so EnsureRequirements inserts — or, when a
  * child already satisfies it, ELIDES — the exchanges and sorts):
  * both children clustered on their key and sorted by (key, time asc).
  * Execution is then a linear two-pointer merge per co-partition: advance
  * the right iterator while its (key, time) is ≤ the current left row's,
  * remembering the last same-key right row seen; that row is the match.
  * Each right row is visited exactly once per partition — O(|L| + |R|),
  * no per-row binary search, no window buffer, and the only retained
  * state is ONE copied right row.
  */
case class AsofMergeJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    carried: Seq[Attribute],
    carriedOut: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carriedOut

  override def producedAttributes: AttributeSet = AttributeSet(carriedOut)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // First-class observability like built-in joins: output volume plus the
  // match rate (left rows that found a prior right row) — the number that
  // says whether the dimension history actually covers the fact stream.
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "left rows with an as-of match"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan): AsofMergeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val carriedB = carried.map(a => BindReferences.bindReference(a: Expression, right.output))
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val outAttrs = output
    val nCarried = carried.length

    // Primitive fast path (same rationale + measurement as
    // RangeMergeJoinExec): keys/times that bind to long-backed columns
    // (LongType, or TimestampType — micros in a long) are read with
    // getLong, skipping boxed eval + interpreted ordering per row.
    import org.apache.spark.sql.types.{LongType, TimestampType}
    def longRef(e: Expression, alsoTs: Boolean): Int = e match {
      case b: BoundReference if b.dataType == LongType ||
        (alsoTs && b.dataType == TimestampType) => b.ordinal
      case _ => -1
    }
    val lkOrd = longRef(lKeyB, alsoTs = false); val ltOrd = longRef(lTimeB, alsoTs = true)
    val rkOrd = longRef(rKeyB, alsoTs = false); val rtOrd = longRef(rTimeB, alsoTs = true)
    val allLong = lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0 &&
      leftTime.dataType == rightTime.dataType

    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val carriedProj = UnsafeProjection.create(carriedB)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joiner = new JoinedRow
      val nulls = new GenericInternalRow(nCarried)
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // The single piece of carried state: the most recent right row whose
        // (key, time) precedes the current left cursor, copied out of the
        // sorter's reused buffer.
        private var carryKey: Any = null
        private var carryKeyLong = 0L
        private var carryRow: InternalRow = null

        override def hasNext: Boolean = lIter.hasNext

        private def nextLong(lRow: InternalRow): InternalRow = {
          if (lRow.isNullAt(lkOrd) || lRow.isNullAt(ltOrd)) {
            numOutputRows += 1
            resultProj(joiner(lRow, nulls))
          } else {
            val lk = lRow.getLong(lkOrd); val lt = lRow.getLong(ltOrd)
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val r = rBuf.head
              if (r.isNullAt(rkOrd) || r.isNullAt(rtOrd)) rBuf.next()
              else {
                val rk = r.getLong(rkOrd)
                if (rk < lk) rBuf.next()
                else if (rk == lk && r.getLong(rtOrd) <= lt) {
                  carryRow = rBuf.next().copy(); carryKeyLong = rk
                } else advancing = false
              }
            }
            val matched = carryRow != null && carryKeyLong == lk
            numOutputRows += 1
            if (matched) numMatchedRows += 1
            resultProj(joiner(lRow, if (matched) carriedProj(carryRow) else nulls))
          }
        }

        private def nextGeneric(lRow: InternalRow): InternalRow = {
          val lk = lKeyB.eval(lRow)
          val lt = lTimeB.eval(lRow)
          if (lk == null || lt == null) {
            numOutputRows += 1
            resultProj(joiner(lRow, nulls))
          } else {
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val rk = rKeyB.eval(rBuf.head)
              val rt = rTimeB.eval(rBuf.head)
              if (rk == null || rt == null) {
                rBuf.next() // null keys/times sort first and never match
              } else {
                val kc = keyOrd.compare(rk, lk)
                if (kc < 0) {
                  // Keys strictly behind the left cursor can never match a
                  // future left row (left is key-ascending): discard.
                  rBuf.next()
                } else if (kc == 0 && timeOrd.compare(rt, lt) <= 0) {
                  carryRow = rBuf.next().copy()
                  carryKey = rk
                } else {
                  advancing = false
                }
              }
            }
            val matched = carryRow != null && keyOrd.compare(carryKey, lk) == 0
            numOutputRows += 1
            if (matched) numMatchedRows += 1
            resultProj(joiner(lRow, if (matched) carriedProj(carryRow) else nulls))
          }
        }

        override def next(): InternalRow = {
          val lRow = lIter.next()
          if (allLong) nextLong(lRow) else nextGeneric(lRow)
        }
      }
    }
  }
}

/** Construction helper: resolves column names against the two analyzed
  * child plans and wraps the result back into a DataFrame. `carried` maps
  * right-side column name → output column name (output names must not
  * collide with left's columns).
  */
object AsofMergeJoin {
  import org.apache.spark.sql.DataFrame

  def apply(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      carried: Seq[(String, String)]
  ): DataFrame = {
    val spark = leftDf.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    // Key/time dtypes must match exactly (ADVICE r5, same contract as
    // RangeMergeJoin): a mismatched pair passes analysis but fails deep in
    // the merge at runtime — fail at construction instead.
    val lk0 = attr(lPlan, leftKeyCol)
    val rk0 = attr(rPlan, rightKeyCol)
    require(lk0.dataType == rk0.dataType,
      s"as-of join key types must match: $leftKeyCol is ${lk0.dataType}, " +
        s"$rightKeyCol is ${rk0.dataType}")
    val lt0 = attr(lPlan, leftTimeCol)
    val rt0 = attr(rPlan, rightTimeCol)
    require(lt0.dataType == rt0.dataType,
      s"as-of join time types must match: $leftTimeCol is ${lt0.dataType}, " +
        s"$rightTimeCol is ${rt0.dataType}")
    val carriedAttrs = carried.map { case (src, _) => attr(rPlan, src) }
    val carriedOut = carried.map { case (src, out) =>
      AttributeReference(out, attr(rPlan, src).dataType, nullable = true)()
    }
    org.apache.spark.sql.graftbridge.DatasetBridge.ofRows(
      spark,
      AsofJoinPlan(
        lPlan, rPlan,
        attr(lPlan, leftKeyCol), attr(rPlan, rightKeyCol),
        attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol),
        carriedAttrs, carriedOut))
  }
}
