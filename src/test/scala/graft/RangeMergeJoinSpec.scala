package graft

/** The bounded-range merge exec ([[graft.plans.RangeMergeJoinExec]]) must
  * agree pair-for-pair with both the cell-replication composition
  * ([[graft.operators.RangeJoin.within]]) and a naive range-predicate
  * join, honor null/edge semantics, keep its sliding buffer honest across
  * key changes, and plan as a merge join (no loop join, ≤2 exchanges).
  */
class RangeMergeJoinSpec extends SparkTestBase {
  import graft.plans.RangeMergeJoin

  private def collectExecs(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[graft.plans.RangeMergeJoinExec] = {
    val here = p match {
      case e: graft.plans.RangeMergeJoinExec => Seq(e)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        collectExecs(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectExecs(q.plan)
      case _ => Nil
    }
    here ++ p.children.flatMap(collectExecs)
  }

  test("pairs: inclusive window edges, nulls never match, per-key isolation") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(10L), Some(100L)),
      (2L, Some(10L), Some(300L)),
      (3L, Some(20L), Some(100L)),
      (4L, None, Some(100L)), // null key
      (5L, Some(10L), None) // null time
    ).toDF("p_event", "user_id", "p_us")
    val right = Seq(
      (101L, Some(10L), Some(50L)), // Δ=50 vs l1 — in (w=50, inclusive)
      (102L, Some(10L), Some(151L)), // Δ=51 vs l1 — out; Δ=149 vs l2 — out
      (103L, Some(10L), Some(250L)), // Δ=50 vs l2 — in
      (104L, Some(20L), Some(100L)), // Δ=0 vs l3 — in, other key
      (105L, Some(10L), None), // null time
      (106L, None, Some(100L)) // null key
    ).toDF("r_event", "uid", "r_us")

    val out = RangeMergeJoin(left, right, "user_id", "uid", "p_us", "r_us", 50L,
        Seq("r_event" -> "r_event"))
      .select("p_event", "r_event").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 101L), (2L, 103L), (3L, 104L)))
  }

  test("merge exec ≡ cell-replication form ≡ naive predicate join, dense history") {
    // 30 keys, colliding times, window spanning several rows per key, so
    // the buffer grows, evicts, and survives key changes.
    val left = spark.range(1500).selectExpr(
      "id AS p_event", "id % 30 AS user_id", "CAST((id * 37) % 499 AS BIGINT) AS p_us")
    val right = spark.range(1200).selectExpr(
      "id + 10000 AS r_event", "id % 30 AS uid", "CAST((id * 53) % 499 AS BIGINT) AS r_us")
    val w = 25L

    val merge = RangeMergeJoin(left, right, "user_id", "uid", "p_us", "r_us", w,
        Seq("r_event" -> "r_event", "r_us" -> "r_us"))
      .selectExpr("p_event", "r_event")

    val cells = graft.operators.RangeJoin
      .within(left, right.withColumnRenamed("uid", "user_id"), "user_id", "p_us", "r_us", w)
      .selectExpr("p_event", "r_event")

    val naive = left.join(right,
        left("user_id") === right("uid") &&
          org.apache.spark.sql.functions.abs(left("p_us") - right("r_us")) <= w)
      .selectExpr("p_event", "r_event")

    val a = merge.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = cells.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val c = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a.nonEmpty && a === b && a === c)
  }

  test("plans as a merge join: no loop join, at most the two child exchanges") {
    val left = spark.range(200).selectExpr("id AS p_event", "id % 7 AS user_id", "id AS p_us")
    val right = spark.range(200).selectExpr("id AS r_event", "id % 7 AS uid", "id AS r_us")
    val df = RangeMergeJoin(left, right, "user_id", "uid", "p_us", "r_us", 3L,
      Seq("r_event" -> "r_event"))
    val n = df.collect().length // force final plan under AQE
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("RangeMergeJoin"), plan)
    // SQLMetrics: output volume matches, and the buffer bound was tracked
    val execs = collectExecs(df.queryExecution.executedPlan)
    assert(execs.nonEmpty)
    assert(execs.head.metrics("numOutputRows").value === n.toLong)
    assert(execs.head.metrics("peakBufferRows").value > 0)
    assert(!plan.contains("NestedLoop"), "range join must not plan a loop join")
    assert(!plan.contains("CartesianProduct"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected at most the two child shuffles:\n$plan")
  }

  test("downstream aggregate on the left key reuses the join's clustering") {
    // outputPartitioning reports the left child's hash clustering, so a
    // groupBy(user_id) above the join must NOT add a third exchange —
    // at scale this is one full corpus shuffle saved per pipeline stage.
    val left = spark.range(500).selectExpr("id AS p_event", "id % 11 AS user_id", "id AS p_us")
    val right = spark.range(500).selectExpr("id AS r_event", "id % 11 AS uid", "id AS r_us")
    val agg = RangeMergeJoin(left, right, "user_id", "uid", "p_us", "r_us", 5L,
        Seq("r_us" -> "r_us"))
      .groupBy("user_id").count()
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"aggregate must reuse the join's partitioning:\n$plan")
  }

  test("buffer evicts: matches per left row bounded by the true window population") {
    // One hot key with 1000 right rows spread over [0, 10000); window 10.
    // Every left row must match ≈ the ~2w/10 rows inside its span — if the
    // buffer failed to evict, late left rows would match early right rows.
    val left = spark.range(100).selectExpr(
      "id AS p_event", "CAST(1 AS BIGINT) AS user_id", "id * 100 AS p_us")
    val right = spark.range(1000).selectExpr(
      "id AS r_event", "CAST(1 AS BIGINT) AS uid", "id * 10 AS r_us")
    val out = RangeMergeJoin(left, right, "user_id", "uid", "p_us", "r_us", 10L,
        Seq("r_us" -> "r_us"))
      .selectExpr("p_event", "p_us", "r_us").collect()
    assert(out.forall(r => math.abs(r.getLong(1) - r.getLong(2)) <= 10L))
    val perLeft = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    // rows at lt−10, lt, lt+10 — except left row 0, which has no lt−10 row
    assert(perLeft.forall { case (p, n) => n == (if (p == 0L) 2 else 3) },
      s"unexpected match counts: $perLeft")
  }
}
