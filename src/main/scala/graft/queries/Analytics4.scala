package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 tranche six: event-sequence analytics — last-touch attribution,
  * 3-step path mining, and watermark lateness accounting (the batch
  * mirror of streaming's late-data policy).
  */
object Analytics4 {

  private def events(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "events")

  val defs: Seq[QueryDef] = Seq(

    // ── Last-touch attribution: every purchase is credited to the user's
    //    most recent non-purchase event within the preceding hour. ONE
    //    pass: a per-user window carries the last non-purchase (ts, type)
    //    struct forward (last_value IGNORE NULLS over the mixed stream —
    //    no self-join, no as-of shuffle), then the channel panel
    //    aggregates conversions and exact purchase cents. Purchases with
    //    no in-window touch report as channel 'none' — unattributed
    //    revenue is data, not a dropped row.
    QueryDef(
      "q154_attribution",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
            round(col("value") * 100).cast(LongType).as("c"))
          .withColumn("touch", last(
            when(col("event_type") =!= "purchase",
              struct(col("ts").as("tts"), col("event_type").as("channel"))),
            ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .select(col("c"),
            when(col("touch").isNotNull
              && col("touch.tts") >= col("ts") - expr("INTERVAL 1 HOUR"),
              col("touch.channel")).otherwise(lit("none")).as("channel"))
          .groupBy(col("channel"))
          .agg(count(lit(1)).as("n_conversions"), sum(col("c")).as("revenue_cents"))
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) t, event_id, event_type,
                 CAST(round(value*100) AS BIGINT) c
               FROM events),
        tch AS (SELECT *, last_value(CASE WHEN event_type <> 'purchase'
                  THEN struct_pack(tts := t, channel := event_type) END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY t, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) touch
                FROM e),
        p AS (SELECT c, CASE WHEN touch IS NOT NULL
                AND touch.tts >= t - INTERVAL 1 HOUR
                THEN touch.channel ELSE 'none' END channel
              FROM tch WHERE event_type = 'purchase')
        SELECT channel, count(*)::BIGINT n_conversions, sum(c)::BIGINT revenue_cents
        FROM p GROUP BY channel""")
    ),

    // ── 3-step path mining: the top-10 most common consecutive event-type
    //    trigrams across user journeys — one step beyond q118's Markov
    //    bigrams, the shape funnel designers actually read. Two leads over
    //    the per-user window, one hash aggregate, TakeOrdered top-10; at
    //    100 TB the window partitions by user (millions of partitions)
    //    and only path counts shuffle.
    QueryDef(
      "q155_event_paths",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .where(col("t2").isNotNull && col("t3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path").asc)
          .limit(10)
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) t, event_id, event_type
               FROM events),
        l AS (SELECT event_type t1,
                lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY t, event_id) t2,
                lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY t, event_id) t3
              FROM e)
        SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*)::BIGINT n
        FROM l WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 10""")
    ),

    // ── Watermark lateness accounting — the batch mirror of streaming's
    //    late-data policy: replay the corpus in ARRIVAL order (event_id),
    //    maintain the running max event time, and classify each event
    //    against watermark = runmax − 10 min. The running max is
    //    distributed two-phase (q96's discipline): 10k-event arrival
    //    shards compute local prefix maxima, shard offsets come from the
    //    dimension-sized shard table — no corpus-wide single-partition
    //    window. Output: per type, on-time/late counts and the worst
    //    lateness — exactly what sizes a streaming watermark before
    //    deploying it.
    QueryDef(
      "q156_late_events",
      (s, d) => {
        val base = events(s, d)
          .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
          .withColumn("shard", expr("event_id div 10000"))
        val shardMax = base.groupBy(col("shard")).agg(max(col("us")).as("sm"))
        val offs = shardMax.select(col("shard"),
          max(col("sm")).over(Window.orderBy(col("shard"))
            .rowsBetween(Window.unboundedPreceding, -1)).as("prevmax"))
        val ws = Window.partitionBy(col("shard")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        base.join(broadcast(offs), "shard")
          .withColumn("runmax",
            // sentinel 0 (epochs are positive) — a MinValue sentinel
            // overflows the lateness subtraction under ANSI mode
            greatest(coalesce(max(col("us")).over(ws), lit(0L)),
              coalesce(col("prevmax"), lit(0L))))
          .select(col("event_type"),
            (col("runmax") - col("us") > lit(600000000L)).as("late"),
            greatest(col("runmax") - col("us") - lit(600000000L), lit(0L)).as("late_us"))
          .groupBy(col("event_type"))
          .agg(sum(when(col("late"), 0L).otherwise(1L)).as("n_ontime"),
            sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
            max(col("late_us")).as("max_lateness_us"))
      },
      Some("""WITH e AS (SELECT event_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) us
               FROM events),
        r AS (SELECT event_type, us,
                max(us) OVER (ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) runmax
              FROM e),
        c AS (SELECT event_type,
                coalesce(runmax, 0) runmax, us FROM r)
        SELECT event_type,
          sum(CASE WHEN runmax - us > 600000000 THEN 0 ELSE 1 END)::BIGINT n_ontime,
          sum(CASE WHEN runmax - us > 600000000 THEN 1 ELSE 0 END)::BIGINT n_late,
          max(greatest(runmax - us - 600000000, 0))::BIGINT max_lateness_us
        FROM c GROUP BY event_type""")
    ),

    // ── RFM segmentation: each purchasing user scored 1-5 on Recency /
    //    Frequency / Monetary by EXACT quintile boundaries, then segment
    //    population counts — the canonical customer-analytics rollup. The
    //    quintiles come from RobustStats.rankSelectMultiByKey (the q107/
    //    q123 bucketed rank-select): all twelve boundaries (3 metrics × 4
    //    cuts) share ONE corpus bucket-count pass and a grid cumsum — no
    //    per-metric sort, no user-count-sized window, so the op survives
    //    millions of users. Boundary ties bucket low (v ≤ boundary), so
    //    equal metrics always land in equal segments.
    QueryDef(
      "q157_rfm",
      (s, d) => {
        val p = events(s, d).where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            round(col("value") * 100).cast(LongType).as("c"))
        val gmax = p.agg(max(col("ts")).as("gmax"))
        // lazy localCheckpoint, not cache (r18): the three metric arms of
        // `tall` each consume u, and the rank-select + bucketing consume
        // tall 3× — with cache every consumer still RE-PLANNED the whole
        // purchase-scan subtree (534-line declared plan, 20 scans, 10
        // broadcast-nested-loop gmax joins); both tables are O(users)
        // post-aggregate rows (never corpus-sized), so the checkpoint
        // barrier is cheap and the plan truncation is the point. No other
        // Analytics4 entry shares these subtrees, so no cross-entry cache
        // reuse is lost.
        val u = p.crossJoin(broadcast(gmax))
          .groupBy(col("user_id"))
          .agg(min(datediff(col("gmax"), col("ts"))).as("rr"),
            count(lit(1)).as("f"), sum(col("c")).as("m"))
          .localCheckpoint(false)
        val tall = u.select(col("user_id"), lit("r").as("metric"), col("rr").cast(DoubleType).as("v"))
          .unionAll(u.select(col("user_id"), lit("f").as("metric"), col("f").cast(DoubleType).as("v")))
          .unionAll(u.select(col("user_id"), lit("m").as("metric"), col("m").cast(DoubleType).as("v")))
          .localCheckpoint(false)
        val bounds = graft.operators.RobustStats.rankSelectMultiByKey(
          tall, "metric", "v", Seq((1, 5, "b1"), (2, 5, "b2"), (3, 5, "b3"), (4, 5, "b4")))
        val wide = bounds.groupBy(col("metric"))
          .agg(max(when(col("_q") === "b1", col("_value"))).as("b1"),
            max(when(col("_q") === "b2", col("_value"))).as("b2"),
            max(when(col("_q") === "b3", col("_value"))).as("b3"),
            max(when(col("_q") === "b4", col("_value"))).as("b4"))
        val bucketed = tall.join(broadcast(wide), "metric")
          .select(col("user_id"), col("metric"),
            (lit(1) + when(col("v") > col("b1"), 1).otherwise(0)
              + when(col("v") > col("b2"), 1).otherwise(0)
              + when(col("v") > col("b3"), 1).otherwise(0)
              + when(col("v") > col("b4"), 1).otherwise(0)).as("bkt"))
        bucketed.groupBy(col("user_id"))
          .agg(max(when(col("metric") === "r", col("bkt"))).as("rb"),
            max(when(col("metric") === "f", col("bkt"))).as("fb"),
            max(when(col("metric") === "m", col("bkt"))).as("mb"))
          .select(concat(col("rb"), col("fb"), col("mb")).as("segment"))
          .groupBy(col("segment")).agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("segment").asc)
          .limit(20)
      },
      Some("""WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) t,
                 CAST(round(value*100) AS BIGINT) c
               FROM events WHERE event_type = 'purchase'),
        g AS (SELECT max(t) gmax FROM p),
        u AS (SELECT user_id,
                min(date_diff('day', t, (SELECT gmax FROM g)))::BIGINT rr,
                count(*)::BIGINT f, sum(c)::BIGINT m
              FROM p GROUP BY 1),
        tall AS (SELECT user_id, 'r' metric, rr::DOUBLE v FROM u
                 UNION ALL SELECT user_id, 'f', f::DOUBLE FROM u
                 UNION ALL SELECT user_id, 'm', m::DOUBLE FROM u),
        rk AS (SELECT metric, v,
                 row_number() OVER (PARTITION BY metric ORDER BY v) rn,
                 count(*) OVER (PARTITION BY metric) n
               FROM tall),
        b AS (SELECT metric, k, min(v) bv
              FROM rk CROSS JOIN (SELECT unnest([1, 2, 3, 4]) k)
              WHERE rn >= (n * k + 4) // 5 GROUP BY 1, 2),
        bw AS (SELECT metric,
                 min(CASE WHEN k = 1 THEN bv END) b1,
                 min(CASE WHEN k = 2 THEN bv END) b2,
                 min(CASE WHEN k = 3 THEN bv END) b3,
                 min(CASE WHEN k = 4 THEN bv END) b4
               FROM b GROUP BY 1),
        bk AS (SELECT t.user_id, t.metric,
                 1 + (CASE WHEN t.v > bw.b1 THEN 1 ELSE 0 END)
                   + (CASE WHEN t.v > bw.b2 THEN 1 ELSE 0 END)
                   + (CASE WHEN t.v > bw.b3 THEN 1 ELSE 0 END)
                   + (CASE WHEN t.v > bw.b4 THEN 1 ELSE 0 END) bkt
               FROM tall t JOIN bw USING (metric)),
        seg AS (SELECT user_id,
                  max(CASE WHEN metric = 'r' THEN bkt END) rb,
                  max(CASE WHEN metric = 'f' THEN bkt END) fb,
                  max(CASE WHEN metric = 'm' THEN bkt END) mb
                FROM bk GROUP BY 1)
        SELECT rb::VARCHAR || fb::VARCHAR || mb::VARCHAR AS segment,
          count(*)::BIGINT n_users
        FROM seg GROUP BY 1 ORDER BY n_users DESC, segment ASC LIMIT 20""")
    ),

    // ── Sliding-window distinct users: exact unique-user counts per
    //    6-hour window hopping hourly — q112's hopping counts upgraded to
    //    COUNT DISTINCT, the always-requested engagement series. Exact
    //    and scale-safe: dedup to (window, user) pairs by hash aggregate
    //    (map-side combine collapses each user's events within a window),
    //    then count — never a distinct inside a window function. Output
    //    capped to the last 24 window starts for a stable panel.
    QueryDef(
      "q158_sliding_distinct",
      (s, d) => events(s, d)
        .select(window(col("ts"), "6 hours", "1 hour").as("w"), col("user_id"))
        .select(col("w.start").as("window_start"), col("user_id"))
        .distinct()
        .groupBy(col("window_start"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("window_start").desc)
        .limit(24),
      Some("""WITH e AS (SELECT user_id,
                 time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) b FROM events),
        hops AS (SELECT DISTINCT user_id, b - (k * INTERVAL 1 HOUR) AS window_start
                 FROM e CROSS JOIN (SELECT unnest(range(0, 6)) k))
        SELECT window_start, count(*)::BIGINT n_users
        FROM hops GROUP BY 1 ORDER BY window_start DESC LIMIT 24""")
    )
  )
}
