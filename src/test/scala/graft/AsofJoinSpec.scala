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
