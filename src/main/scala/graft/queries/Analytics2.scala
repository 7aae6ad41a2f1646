package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second analytics tranche: sessionization, pivot, time-bucketed rollups,
  * exact distributed median, and ntile bucketing — the event-stream and
  * reporting shapes a telemetry engine serves daily.
  */
object Analytics2 {

  private val dec = DecimalType(18, 2)

  private def ord(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "orders")
  private def ev(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "events")

  val defs: Seq[QueryDef] = Seq(

    // ── RANGE-frame windows: trailing 1-hour count/sum per user (a VALUE
    //    range over event time, not a row count — peers at the same
    //    timestamp all enter the frame) plus dense_rank / percent_rank —
    //    the remaining window-frame and ranking surface.
    QueryDef(
      "q67_range_window",
      (s, d) => {
        val base = ev(s, d).select(
          col("event_id"), col("user_id"), col("value"),
          unix_micros(col("ts")).as("us"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-3600L * 1000000L, 0L)
        val wr = Window.partitionBy(col("user_id")).orderBy(col("value"))
        base
          .withColumn("trailing_n", count(lit(1)).over(w))
          .withColumn("trailing_sum", sum(col("value").cast(dec)).over(w).cast(DoubleType))
          .withColumn("vrank", dense_rank().over(wr).cast(LongType))
          .withColumn("vpct", percent_rank().over(wr))
          .select("event_id", "user_id", "us", "trailing_n", "trailing_sum", "vrank", "vpct")
      },
      Some("""WITH e AS (SELECT event_id, user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) us FROM events)
        SELECT event_id, user_id, us,
          count(*) OVER (PARTITION BY user_id ORDER BY us RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS trailing_n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY us RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_sum,
          dense_rank() OVER (PARTITION BY user_id ORDER BY value) AS vrank,
          percent_rank() OVER (PARTITION BY user_id ORDER BY value) AS vpct
        FROM e""")
    ),

    // ── Sessionization: 30-minute-gap sessions per user via lag + running
    //    sum of session-break flags — the linear-scan formulation (one
    //    shuffle on user_id, no self-join), identical in any engine.
    QueryDef(
      "q22_sessionize",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("brk",
            when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("brk")).over(run))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events")
          )
      },
      Some("""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        g AS (SELECT user_id, ts, event_id,
          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_us FROM e),
        b AS (SELECT user_id, ts, event_id,
          CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END brk FROM g),
        sid AS (SELECT user_id, ts,
          CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) session_id
          FROM b)
        SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
        FROM sid GROUP BY user_id, session_id""")
    ),

    // ── Pivot (explicit CASE aggregation — what .pivot() desugars to, with
    //    engine-identical 0-for-absent semantics).
    QueryDef(
      "q24_pivot",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val aggs = types.map(t => count(when(col("event_type") === t, 1)).as(s"n_$t")) :+
          sum(col("value").cast(dec)).cast(DoubleType).as("total_value")
        ev(s, d).groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
      },
      Some("""SELECT user_id,
          count(*) FILTER (event_type = 'click') AS n_click,
          count(*) FILTER (event_type = 'error') AS n_error,
          count(*) FILTER (event_type = 'purchase') AS n_purchase,
          count(*) FILTER (event_type = 'signup') AS n_signup,
          count(*) FILTER (event_type = 'view') AS n_view,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY user_id""")
    ),

    // ── Time-bucketed rollup: daily event counts and value sums — the
    //    partition-by-day shape 100 TB telemetry tables are laid out in.
    QueryDef(
      "q25_time_bucket",
      (s, d) =>
        ev(s, d)
          .groupBy(date_trunc("DAY", col("ts")).as("day"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast(dec)).cast(DoubleType).as("total_value")
          ),
      Some("""WITH e AS (SELECT event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events)
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM e GROUP BY 1, 2""")
    ),

    // ── Exact distributed median (no percentile_cont cross-engine
    //    interpolation hazards): row_number + count picks the middle
    //    element(s); DECIMAL mean of the two middles is engine-exact.
    QueryDef(
      "q23_median",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"), col("o_orderkey"))
        val cw = Window.partitionBy(col("o_orderpriority"))
        ord(s, d)
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(cw))
          .where(col("rn") * 2 === col("cnt") || col("rn") * 2 === col("cnt") + 1 || col("rn") * 2 === col("cnt") + 2)
          .groupBy(col("o_orderpriority"))
          .agg((sum(col("o_totalprice").cast(dec)) / count(lit(1))).cast(DoubleType).as("median_price"))
      },
      Some("""WITH r AS (SELECT o_orderpriority, o_totalprice,
          row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) rn,
          count(*) OVER (PARTITION BY o_orderpriority) cnt
        FROM orders)
        SELECT o_orderpriority,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) / count(*) AS DOUBLE) AS median_price
        FROM r WHERE rn * 2 = cnt OR rn * 2 = cnt + 1 OR rn * 2 = cnt + 2
        GROUP BY o_orderpriority""")
    ),

    // ── Bounded-range self-join: each error event matched to the same
    //    user's click events within ±5 minutes, via the bucketed interval
    //    join (equi-join on time cells, never a per-key cross product).
    //    The oracle is the plain theta join — proving the bucketing loses
    //    and duplicates nothing.
    QueryDef(
      "q29_range_join",
      (s, d) => {
        val e = ev(s, d)
        val errs = e.where(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id"), unix_micros(col("ts")).as("err_us"))
        val clicks = e.where(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), unix_micros(col("ts")).as("click_us"))
        graft.operators.RangeJoin
          .within(errs, clicks, "user_id", "err_us", "click_us", windowMicros = 300L * 1000000L)
          .select(col("err_id"), col("click_id"), col("user_id"),
            (col("click_us") - col("err_us")).as("delta_us"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) us FROM events)
        SELECT a.event_id AS err_id, b.event_id AS click_id, a.user_id,
          b.us - a.us AS delta_us
        FROM e a JOIN e b ON a.user_id = b.user_id
          AND a.event_type = 'error' AND b.event_type = 'click'
          AND abs(a.us - b.us) <= 300 * 1000000""")
    ),

    // ── Salted two-phase aggregation (skew mitigation): spreading each
    //    key over hash-salt buckets then recombining must equal the plain
    //    GROUP BY — which is exactly what the oracle asserts.
    QueryDef(
      "q27_salted_agg",
      (s, d) => graft.operators.Skew.saltedSumCount(ev(s, d), "user_id", "value", buckets = 8),
      Some("""SELECT user_id,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
          count(*) AS n
        FROM events GROUP BY user_id""")
    ),

    // ── NTILE bucketing: per-customer order-price quartiles.
    QueryDef(
      "q26_ntile",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
        ord(s, d).select(
          col("o_custkey"),
          col("o_orderkey"),
          col("o_totalprice"),
          ntile(4).over(w).as("quartile")
        )
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
          ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders""")
    ),

    // ── Changelog merge (CDC apply / MERGE INTO): a base snapshot plus
    //    two change waves (upserts, deletes, then re-upserts) collapse to
    //    final state — highest-seq change wins per key, deletes drop the
    //    row. The winner pick is a hash-aggregate struct MAX over
    //    base ∪ changelog (map-side combine, no per-key sort, no window),
    //    which is the shape that survives a billion-key changelog. The
    //    waves are derived deterministically from the snapshot so the
    //    oracle replays them exactly.
    QueryDef(
      "q111_merge_upsert",
      (s, d) => {
        val o = ord(s, d)
        def slice(p: org.apache.spark.sql.Column) = o.where(p)
        val base = o.select(col("o_orderkey").as("k"), col("o_totalprice").as("price"),
          col("o_orderstatus").as("status"), lit(0L).as("seq"), lit("U").as("op"))
        val wave1u = slice(pmod(col("o_orderkey"), lit(10)) < 3)
          .select(col("o_orderkey").as("k"), (col("o_totalprice") + 100.0).as("price"),
            col("o_orderstatus").as("status"), lit(1L).as("seq"), lit("U").as("op"))
        val wave1d = slice(pmod(col("o_orderkey"), lit(10)) === 3)
          .select(col("o_orderkey").as("k"), lit(0.0).as("price"),
            lit("X").as("status"), lit(1L).as("seq"), lit("D").as("op"))
        val wave2u = slice(pmod(col("o_orderkey"), lit(20)) === 0)
          .select(col("o_orderkey").as("k"), (col("o_totalprice") * 2.0).as("price"),
            col("o_orderstatus").as("status"), lit(2L).as("seq"), lit("U").as("op"))
        base.union(wave1u).union(wave1d).union(wave2u)
          .groupBy(col("k"))
          .agg(max(struct(col("seq"), col("op"), col("price"), col("status"))).as("w"))
          .where(col("w.op") === "U")
          .select(col("k"), col("w.price").as("price"), col("w.status").as("status"))
      },
      Some("""WITH base AS (SELECT o_orderkey k, o_totalprice price, o_orderstatus status,
            0::BIGINT seq, 'U' op FROM orders),
        w1u AS (SELECT o_orderkey, o_totalprice + 100.0, o_orderstatus, 1::BIGINT, 'U'
                FROM orders WHERE o_orderkey % 10 < 3),
        w1d AS (SELECT o_orderkey, 0.0, 'X', 1::BIGINT, 'D'
                FROM orders WHERE o_orderkey % 10 = 3),
        w2u AS (SELECT o_orderkey, o_totalprice * 2.0, o_orderstatus, 2::BIGINT, 'U'
                FROM orders WHERE o_orderkey % 20 = 0),
        all_rows AS (SELECT * FROM base UNION ALL SELECT * FROM w1u
                     UNION ALL SELECT * FROM w1d UNION ALL SELECT * FROM w2u),
        ranked AS (SELECT k, price, status, op,
            row_number() OVER (PARTITION BY k ORDER BY seq DESC) rn
          FROM all_rows)
        SELECT k, price, status FROM ranked WHERE rn = 1 AND op = 'U'""")
    ),

    // ── Hopping (sliding) time windows: 1-hour windows every 15 minutes —
    //    each event lands in 4 overlapping windows. Spark's window()
    //    generator expands events map-side; the aggregate stays two-phase.
    //    The oracle replays the same epoch-aligned window arithmetic via a
    //    4-offset expansion off the 15-minute bucket.
    QueryDef(
      "q112_hopping_window",
      (s, d) => ev(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast(DoubleType).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total_value")),
      Some("""WITH e AS (SELECT event_type, value,
            time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP)) b FROM events),
        hops AS (SELECT event_type, value,
            b - (k * INTERVAL 15 MINUTE) AS window_start
          FROM e CROSS JOIN (SELECT unnest(range(0, 4)) k))
        SELECT window_start, event_type, count(*)::BIGINT n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) total_value
        FROM hops GROUP BY 1, 2""")
    )
  )
}
