package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

/** As-of join edge semantics: inclusive equal-time match, null when no
  * prior right row, latest-prior wins, key isolation.
  */
class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("backward as-of: inclusive ties, nulls, latest-prior, per-key") {
    val left = Seq(
      (1L, 10L, 100L), // user 1: t=100
      (2L, 10L, 50L), // user 1: t=50 — before every right row
      (3L, 20L, 100L) // user 2: isolated key
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 80L), // user 1
      (10L, 100L), // user 1: equal-time must match (>= semantics)
      (20L, 101L) // user 2: AFTER the left row — must not match
    ).toDF("user_id", "rts")

    val out = AsofJoin.asofBackward(left, right, "user_id", "ts", "rts")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap

    assert(out(1L) === 100L) // equal timestamp matches, and beats 80
    assert(out(2L) === -1L) // nothing at-or-before
    assert(out(3L) === -1L) // later right row ignored; keys isolated
  }
}

/** The custom physical operator ([[graft.plans.AsofMergeJoinExec]]) must
  * agree row-for-row with the window-composition form on the same inputs,
  * honor the same edge semantics, and plan as a genuine merge join (no
  * Window, no nested loop, exactly the two child exchanges).
  */
class AsofMergeJoinSpec extends SparkTestBase {
  import spark.implicits._
  import graft.plans.AsofMergeJoin

  test("merge exec: inclusive ties, nulls, latest-prior, per-key") {
    val left = Seq(
      (1L, 10L, 100L),
      (2L, 10L, 50L),
      (3L, 20L, 100L)
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 80L),
      (10L, 100L),
      (20L, 101L)
    ).toDF("uid", "rts")

    val out = AsofMergeJoin(left, right, "user_id", "uid", "ts", "rts", Seq("rts" -> "matched_rts"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap

    assert(out(1L) === 100L)
    assert(out(2L) === -1L)
    assert(out(3L) === -1L)
  }

  test("merge exec ≡ window composition on a dense generated history") {
    // 40 keys × interleaved left/right rows with collisions and gaps;
    // right side unique per (key, time) so both formulations are
    // deterministic on ties.
    val left = spark.range(2000).selectExpr(
      "id AS event_id", "id % 40 AS user_id", "(id * 37) % 997 AS ts")
    val right = spark.range(1500)
      .selectExpr("id % 40 AS uid", "(id * 53) % 997 AS rts", "id AS payload")
      .groupBy("uid", "rts").agg(max("payload").as("payload"))

    val merge = AsofMergeJoin(left, right, "user_id", "uid", "ts", "rts",
      Seq("rts" -> "m_rts", "payload" -> "m_payload"))
      .selectExpr("event_id", "m_rts", "m_payload")

    // Compositional oracle: carry rts via asofBackward, then re-attach the
    // payload by joining back on the (key, matched-time) pair.
    val viaWindow = graft.operators.AsofJoin
      .asofBackward(left, right.withColumnRenamed("uid", "user_id")
        .select("user_id", "rts"), "user_id", "ts", "rts")
      .join(right.withColumnRenamed("uid", "user_id"),
        Seq("user_id", "rts"), "left")
      .selectExpr("event_id", "rts AS m_rts", "payload AS m_payload")

    val a = merge.orderBy("event_id").collect().map(_.toSeq).toSeq
    val b = viaWindow.orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("merge exec plans as a merge join: no Window, no loop join, two exchanges") {
    val left = spark.range(100).selectExpr("id AS event_id", "id % 7 AS user_id", "id AS ts")
    val right = spark.range(100).selectExpr("id % 7 AS uid", "id AS rts")
    val df = AsofMergeJoin(left, right, "user_id", "uid", "ts", "rts", Seq("rts" -> "m_rts"))
    df.collect() // force final plan under AQE
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("AsofMergeJoin"), plan)
    assert(!plan.contains("Window"), "as-of must not fall back to a window")
    assert(!plan.contains("NestedLoop"), "as-of must not plan a loop join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected at most the two child shuffles:\n$plan")
  }
}
