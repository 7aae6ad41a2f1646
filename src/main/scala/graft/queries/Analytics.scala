package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Analytic surface beyond the reference's own operators — the standard
  * categories SURVEY.md §2.9 declares absent from the reference but in
  * scope for the engine: window functions (ranking / analytic / frames),
  * set operations, grouping sets (rollup / cube), correlated subqueries,
  * and the as-of join (composed from union + window, since Spark has no
  * native ASOF — see [[graft.operators.AsofJoin]]).
  *
  * Scale posture: every window partitions by a high-cardinality key
  * (customer / user), so the single shuffle each query needs distributes
  * evenly; no query collects to the driver.
  */
object Analytics {

  private val dec = DecimalType(18, 2)

  private def ord(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "orders")
  private def cust(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "customer")
  private def ev(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "events")

  val defs: Seq[QueryDef] = Seq(

    // ── Window / ranking: top-3 orders per customer by price. Spark plans a
    //    single hash-partition shuffle on o_custkey; the rank filter removes
    //    the need for a global sort.
    QueryDef(
      "q15_window_topk",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        ord(s, d)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) t WHERE rn <= 3""")
    ),

    // ── Window / analytic frame: per-user running total (rows frame) and
    //    lag delta over the event stream. DECIMAL keeps the running sum
    //    engine-exact regardless of accumulation order.
    QueryDef(
      "q16_window_running",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        ev(s, d)
          .withColumn("running_value", sum(col("value").cast(dec)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast(DoubleType))
          .withColumn("prev_value", coalesce(lag(col("value"), 1).over(w), lit(0.0)))
          .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("running_value"), col("prev_value"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events)
        SELECT event_id, user_id, ts, value,
          CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
          coalesce(lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0) AS prev_value
        FROM ev""")
    ),

    // ── Set operations: INTERSECT (customers active in both segments'
    //    order flows) and EXCEPT, over key sets.
    QueryDef(
      "q17_set_ops",
      (s, d) => {
        val o = ord(s, d)
        val hi = o.where(col("o_totalprice") > 100000.0).select(col("o_custkey"))
        val urgent = o.where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        val lo = o.where(col("o_totalprice") < 50000.0).select(col("o_custkey"))
        hi.intersect(urgent).except(lo)
      },
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_totalprice < 50000.0""")
    ),

    // ── Grouping sets: ROLLUP over (status, priority) with GROUPING()
    //    disambiguation of the null super-aggregate rows.
    QueryDef(
      "q18_rollup",
      (s, d) =>
        ord(s, d)
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(dec)).cast(DoubleType).as("total"),
            grouping(col("o_orderstatus")).as("g_status"),
            grouping(col("o_orderpriority")).as("g_priority")
          ),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
          CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""")
    ),

    // ── Grouping sets: CUBE over (event_type, hour-of-day) on the stream
    //    table.
    QueryDef(
      "q19_cube",
      (s, d) =>
        ev(s, d)
          .withColumn("hr", hour(col("ts")))
          .cube(col("event_type"), col("hr"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast(dec)).cast(DoubleType).as("total"),
            grouping(col("event_type")).as("g_type"),
            grouping(col("hr")).as("g_hr")
          ),
      Some("""WITH ev AS (SELECT event_type, value, CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr FROM events)
        SELECT event_type, hr, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
          CAST(grouping(event_type) AS INTEGER) AS g_type,
          CAST(grouping(hr) AS INTEGER) AS g_hr
        FROM ev GROUP BY CUBE (event_type, hr)""")
    ),

    // ── As-of join: each purchase matched to the user's most recent
    //    click at-or-before it. Spark composition: union + last(ignoreNulls)
    //    window (one shuffle on user_id, linear scan per partition — scales
    //    to arbitrarily long histories); DuckDB validates with native
    //    ASOF JOIN semantics.
    QueryDef(
      "q20_asof_join",
      (s, d) => {
        val e = ev(s, d)
        graft.operators.AsofJoin.asofBackward(
          left = e.where(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("ts")),
          right = e.where(col("event_type") === "click")
            .select(col("user_id"), col("ts").as("click_ts")),
          keyCol = "user_id",
          leftTime = "ts",
          rightTime = "click_ts"
        )
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts AS click_ts FROM ev WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, p.ts, c.click_ts
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts""")
    ),

    // ── Correlated scalar subquery: orders priced above their customer's
    //    average. Spark decorrelates to an aggregate + equi-join — same
    //    plan Catalyst derives from the SQL form.
    QueryDef(
      "q21_corr_subquery",
      (s, d) => {
        val o = ord(s, d)
        val avgPer = o.groupBy(col("o_custkey"))
          .agg((sum(col("o_totalprice").cast(dec)) / count(lit(1))).cast(DoubleType).as("avg_price"))
        o.join(avgPer, Seq("o_custkey"))
          .where(col("o_totalprice") > col("avg_price"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        WHERE o_totalprice > (
          SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
          FROM orders i WHERE i.o_custkey = o.o_custkey)""")
    )
  )
}
