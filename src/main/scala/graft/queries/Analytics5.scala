package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 tranche seven: the custom-physical-operator surface and the
  * remaining vector/sketch economics — queries whose POINT is the plan
  * shape, declared and oracle-checked like everything else.
  */
object Analytics5 {

  private def events(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "events")

  val defs: Seq[QueryDef] = Seq(

    // ── Native AS-OF merge join: each purchase gains the user's most
    //    recent click value at-or-before it, via the engine's custom
    //    physical operator (plans/AsofMergeJoin.scala — logical node +
    //    planner strategy + sorted-merge SparkPlan). The exec declares
    //    ClusteredDistribution(key) + (key, time) ordering on both
    //    children and streams a two-pointer merge per co-partition:
    //    O(|L|+|R|), one retained right row, no window buffer, no union
    //    materialization. Its outputPartitioning reports the left
    //    clustering, so the per-user aggregate below re-uses the merge
    //    join's shuffle — three shuffles total becomes two. DuckDB's
    //    native ASOF LEFT JOIN is the oracle: two independent engines,
    //    same temporal-join semantics.
    QueryDef(
      "q165_asof_merge",
      (s, d) => {
        val e = events(s, d)
        val purchases = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            round(col("value") * 100).cast(LongType).as("cents"))
        // right side unique per (user, ts) so tie-handling is engine-free
        val clicks = e.where(col("event_type") === "click")
          .select(col("user_id").as("uid"), col("ts").as("cts"),
            round(col("value") * 100).cast(LongType).as("cc"))
          .groupBy(col("uid"), col("cts")).agg(max(col("cc")).as("ccents"))
        graft.plans.AsofMergeJoin(purchases, clicks,
            "user_id", "uid", "ts", "cts", Seq("ccents" -> "carried"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_purchases"),
            count(col("carried")).as("n_matched"),
            coalesce(sum(col("carried")), lit(0L)).as("carried_cents"))
      },
      Some("""WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) t
                 FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id uid, CAST(ts AS TIMESTAMP) ct,
                max(CAST(round(value * 100) AS BIGINT)) ccents
              FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        SELECT p.user_id, count(*)::BIGINT n_purchases,
          count(c.ccents)::BIGINT n_matched,
          coalesce(sum(c.ccents), 0)::BIGINT carried_cents
        FROM p ASOF LEFT JOIN c ON p.user_id = c.uid AND p.t >= c.ct
        GROUP BY 1""")
    )
  )
}
