package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 tranche seven: the custom-physical-operator surface and the
  * remaining vector/sketch economics — queries whose POINT is the plan
  * shape, declared and oracle-checked like everything else.
  */
object Analytics5 {

  private def events(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "events")
  private def docs(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "documents")
  private def emb(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "embeddings")

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
    ),

    // ── Johnson–Lindenstrauss random-projection audit: project the
    //    64-dim embeddings to 16 dims with a deterministic ±1 sign
    //    matrix (parity of md5("jl|i|j") — both engines derive the SAME
    //    matrix, no RNG), then measure how well pairwise squared
    //    distances survive. Everything is exact integer arithmetic: dims
    //    quantize once (floor(v·1024 + 0.5)), the projection is a sum of
    //    signed integers, and the per-pair ratio dproj²·10⁶ div (k·dorig²)
    //    is integer ppm. Pair differences come from a (pair, dim) GROUP
    //    BY with a signed sum — vec 2m minus vec 2m+1 — so NO self-join
    //    touches the corpus. Scale shape: one 16× widening equi-join
    //    against a BROADCAST 1024-row sign table, then hash aggregates
    //    all the way down; this is the sketch that makes billion-vector
    //    similarity work downstream (project once, search in 1/4 of the
    //    bytes).
    QueryDef(
      "q166_jl_projection",
      (s, d) => {
        import org.apache.spark.sql.SparkSession
        val k = 16
        // cached: the projected-distance and original-distance branches
        // both consume the quantized explode (corpus-sized ⇒ cache, r18)
        val q = emb(s, d)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
          .select(col("vec_id"), col("dim").cast(LongType).as("dim"),
            expr("CAST(floor(CAST(v AS DOUBLE) * 1024 + 0.5) AS BIGINT)").as("q"))
          .cache()
        val signs = s.range(64).toDF("dim").crossJoin(s.range(k).toDF("j"))
          .select(col("dim"), col("j"),
            (lit(1L) - lit(2L) * pmod(graft.functions.TextFunctions.hash32(
              concat(lit("jl|"), col("dim").cast(StringType), lit("|"),
                col("j").cast(StringType))), lit(2L))).as("sgn"))
        val proj = q.join(broadcast(signs), "dim")
          .groupBy(col("vec_id"), col("j"))
          .agg(sum(col("q") * col("sgn")).as("p"))
        val dproj = proj
          .select(expr("vec_id div 2").as("pair"), pmod(col("vec_id"), lit(2L)).as("side"),
            col("j"), col("p"))
          .groupBy(col("pair"), col("j"))
          .agg(sum(when(col("side") === 0, col("p")).otherwise(-col("p"))).as("dj"),
            count(lit(1)).as("ns"))
          .where(col("ns") === 2)
          .groupBy(col("pair")).agg(sum(col("dj") * col("dj")).as("dp2"))
        val dorig = q
          .select(expr("vec_id div 2").as("pair"), pmod(col("vec_id"), lit(2L)).as("side"),
            col("dim"), col("q"))
          .groupBy(col("pair"), col("dim"))
          .agg(sum(when(col("side") === 0, col("q")).otherwise(-col("q"))).as("dd"),
            count(lit(1)).as("ns"))
          .where(col("ns") === 2)
          .groupBy(col("pair")).agg(sum(col("dd") * col("dd")).as("do2"))
        dproj.join(dorig, "pair").where(col("do2") > 0)
          .select(expr(s"(dp2 * 1000000) div ($k * do2)").as("ppm"))
          .agg(count(lit(1)).as("n_pairs"),
            min(col("ppm")).as("min_ppm"), max(col("ppm")).as("max_ppm"),
            sum(col("ppm")).as("sum_ppm"),
            sum(when(abs(col("ppm") - 1000000) <= 500000, 1L).otherwise(0L))
              .as("n_within_50pct"))
      },
      Some("""WITH q AS (SELECT vec_id, j dim,
                 CAST(floor(CAST(embedding[j+1] AS DOUBLE) * 1024 + 0.5) AS BIGINT) q
               FROM embeddings, unnest(range(0, len(embedding))) t(j)),
        signs AS (SELECT d.dim, jj.j,
                1 - 2 * ((('0x'||substr(md5('jl|'||d.dim::VARCHAR||'|'||jj.j::VARCHAR),1,8))::BIGINT) % 2) sgn
              FROM (SELECT unnest(range(0, 64)) dim) d
              CROSS JOIN (SELECT unnest(range(0, 16)) j) jj),
        proj AS (SELECT vec_id, j, sum(q * sgn)::BIGINT p
                 FROM q JOIN signs ON q.dim = signs.dim GROUP BY 1, 2),
        dp AS (SELECT vec_id // 2 pair, j,
                 sum(CASE WHEN vec_id % 2 = 0 THEN p ELSE -p END)::BIGINT dj,
                 count(*) ns
               FROM proj GROUP BY 1, 2),
        dp2 AS (SELECT pair, sum(dj * dj)::BIGINT dp2 FROM dp WHERE ns = 2 GROUP BY 1),
        dd AS (SELECT vec_id // 2 pair, dim,
                 sum(CASE WHEN vec_id % 2 = 0 THEN q ELSE -q END)::BIGINT dd,
                 count(*) ns
               FROM q GROUP BY 1, 2),
        do2 AS (SELECT pair, sum(dd * dd)::BIGINT do2 FROM dd WHERE ns = 2 GROUP BY 1),
        r AS (SELECT CAST((dp2 * 1000000) // (16 * do2) AS BIGINT) ppm
              FROM dp2 JOIN do2 USING (pair) WHERE do2 > 0)
        SELECT count(*)::BIGINT n_pairs, min(ppm)::BIGINT min_ppm,
          max(ppm)::BIGINT max_ppm, sum(ppm)::BIGINT sum_ppm,
          sum(CASE WHEN abs(ppm - 1000000) <= 500000 THEN 1 ELSE 0 END)::BIGINT n_within_50pct
        FROM r""")
    ),

    // ── Per-dimension variance screen (the PCA precursor): exact
    //    variance numerator n·Σq² − (Σq)² per embedding dimension over
    //    the 1024-quantized values, top-10 dims by variance with each
    //    dim's share of total variance in ppm. ONE posexplode + hash
    //    aggregate is the only corpus-sized stage (64 cells per vector,
    //    map-side combine); the 64-row dim table then broadcasts against
    //    its own total. At 100 TB the counts×squares products leave
    //    BIGINT — production keeps the aggregate in DECIMAL(38,0); at
    //    driver SFs the values are BIGINT-exact, which is what the
    //    oracle pins.
    QueryDef(
      "q167_dim_variance",
      (s, d) => {
        val per = emb(s, d)
          .select(posexplode(col("embedding")).as(Seq("dim", "v")))
          .select(col("dim").cast(LongType).as("dim"),
            expr("CAST(floor(CAST(v AS DOUBLE) * 1024 + 0.5) AS BIGINT)").as("q"))
          .groupBy(col("dim"))
          .agg(count(lit(1)).as("n"), sum(col("q")).as("s1"),
            sum(col("q") * col("q")).as("s2"))
          .select(col("dim"), (col("n") * col("s2") - col("s1") * col("s1")).as("var_num"))
        per.crossJoin(broadcast(per.agg(sum(col("var_num")).as("vt"))))
          .select(col("dim"), col("var_num"),
            expr("(var_num * 1000000) div vt").as("share_ppm"))
          .orderBy(col("var_num").desc, col("dim").asc)
          .limit(10)
      },
      Some("""WITH q AS (SELECT j dim,
                 CAST(floor(CAST(embedding[j+1] AS DOUBLE) * 1024 + 0.5) AS BIGINT) q
               FROM embeddings, unnest(range(0, len(embedding))) t(j)),
        per AS (SELECT dim,
                  (count(*) * sum(q * q) - sum(q) * sum(q))::BIGINT var_num
                FROM q GROUP BY 1),
        t AS (SELECT sum(var_num)::BIGINT vt FROM per)
        SELECT dim, var_num, CAST((var_num * 1000000) // t.vt AS BIGINT) share_ppm
        FROM per CROSS JOIN t
        ORDER BY var_num DESC, dim ASC LIMIT 10""")
    ),

    // ── Posting-list compression economics: for the 50 highest-df terms,
    //    the byte cost of the doc-id list as raw int64 vs delta+varint —
    //    the arithmetic that decides whether an inverted index (q122)
    //    fits in memory at corpus scale. Gaps come from a PER-TERM lag
    //    window (bounded: only the 50 broadcast-selected terms ever
    //    enter the window), varint width is a pure integer CASE ladder,
    //    both engines walk identical sorted lists. Ratio in ppm is
    //    integer-exact.
    QueryDef(
      "q168_postings_size",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val posting = docs(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .where(length(col("term")) > 0)
          .distinct()
        val top = posting.groupBy(col("term")).agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("term").asc).limit(50)
        posting.join(broadcast(top), "term")
          .withColumn("prev",
            lag(col("doc_id"), 1).over(Window.partitionBy(col("term")).orderBy(col("doc_id"))))
          .withColumn("g", coalesce(col("doc_id") - col("prev"), col("doc_id")))
          .withColumn("vb",
            lit(1L) + when(col("g") >= 128L, 1L).otherwise(0L)
              + when(col("g") >= 16384L, 1L).otherwise(0L)
              + when(col("g") >= 2097152L, 1L).otherwise(0L)
              + when(col("g") >= 268435456L, 1L).otherwise(0L))
          .groupBy(col("term"))
          .agg(max(col("df")).as("df"), sum(col("vb")).as("varint_bytes"))
          .select(col("term"), col("df"), (col("df") * 8).as("raw_bytes"),
            col("varint_bytes"),
            expr("(varint_bytes * 1000000) div (df * 8)").as("ratio_ppm"))
          .orderBy(col("df").desc, col("term").asc)
      },
      Some("""WITH posting AS (SELECT DISTINCT doc_id, t.term
               FROM documents, unnest(string_split(text, ' ')) t(term)
               WHERE len(t.term) > 0),
        top AS (SELECT term, count(*)::BIGINT df FROM posting GROUP BY 1
                ORDER BY df DESC, term ASC LIMIT 50),
        g AS (SELECT p.term, p.doc_id,
                coalesce(p.doc_id - lag(p.doc_id) OVER
                  (PARTITION BY p.term ORDER BY p.doc_id), p.doc_id) g
              FROM posting p JOIN top USING (term)),
        v AS (SELECT term,
                sum(1 + CASE WHEN g >= 128 THEN 1 ELSE 0 END
                      + CASE WHEN g >= 16384 THEN 1 ELSE 0 END
                      + CASE WHEN g >= 2097152 THEN 1 ELSE 0 END
                      + CASE WHEN g >= 268435456 THEN 1 ELSE 0 END)::BIGINT varint_bytes
              FROM g GROUP BY 1)
        SELECT top.term, df, (df * 8)::BIGINT raw_bytes, varint_bytes,
          CAST((varint_bytes * 1000000) // (df * 8) AS BIGINT) ratio_ppm
        FROM top JOIN v USING (term)
        ORDER BY df DESC, term ASC""")
    ),

    // ── Native bounded-RANGE merge join: every (purchase, view|click)
    //    pair of the same user within ±1 hour, via the engine's second
    //    custom physical operator (plans/RangeMergeJoin.scala). Unlike
    //    the cell-replication form (operators/RangeJoin.within, 3× left
    //    replication through the shuffle), the merge exec shuffles each
    //    side once unreplicated and streams a sliding buffer whose
    //    retained state is exactly one key's rows inside one 2w span —
    //    O(|L|+|R|+matches). The oracle is the plain SQL range predicate
    //    (DuckDB plans its own IEJoin): two engines, two algorithms, one
    //    pair set.
    QueryDef(
      "q169_range_merge_join",
      (s, d) => {
        val e = events(s, d)
        val p = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_event"),
            unix_micros(col("ts")).as("p_us"))
        val v = e.where(col("event_type").isin("view", "click"))
          .select(col("user_id").as("uid"), col("event_id").as("r_event"),
            unix_micros(col("ts")).as("r_us"))
        graft.plans.RangeMergeJoin(p, v, "user_id", "uid", "p_us", "r_us",
            3600000000L, Seq("r_event" -> "r_event", "r_us" -> "r_us"))
          .select(col("user_id"), col("p_event"), col("r_event"),
            (col("r_us") - col("p_us")).as("delta_us"))
      },
      Some("""WITH p AS (SELECT user_id, event_id p_event,
                 epoch_us(CAST(ts AS TIMESTAMP)) p_us
               FROM events WHERE event_type = 'purchase'),
        v AS (SELECT user_id, event_id r_event,
                epoch_us(CAST(ts AS TIMESTAMP)) r_us
              FROM events WHERE event_type IN ('view', 'click'))
        SELECT p.user_id, p_event, r_event, r_us - p_us AS delta_us
        FROM p JOIN v USING (user_id)
        WHERE abs(r_us - p_us) <= 3600000000""")
    ),

    // ── Association lift (market-basket over event types): for every
    //    type pair, how much more often do users do BOTH than
    //    independence predicts — lift = P(a∧b)/(P(a)·P(b)) as exact
    //    integer ppm: (n_ab·N·10⁶) div (n_a·n_b). Baskets dedupe to
    //    (user, type) first, so the pair join fans out ≤ types²/2 rows
    //    per user — linear in users, never |events|². The type-count dim
    //    broadcasts. This is the co-occurrence layer under
    //    recommendation/affinity rules; q118's Markov chain is its
    //    SEQUENTIAL cousin, this is the set-wise one.
    QueryDef(
      "q175_assoc_lift",
      (s, d) => {
        // the distinct basket is consumed FOUR times (user total, per-type
        // counts, both self-join sides) and re-ran the events scan +
        // distinct each time; checkpoint once (narrow post-agg table, r18)
        val basket = events(s, d).select(col("user_id"), col("event_type")).distinct()
          .localCheckpoint(false)
        val nTot = basket.select(col("user_id")).distinct().agg(count(lit(1)).as("nu"))
        val per = basket.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        basket.toDF("user_id", "ta")
          .join(basket.toDF("uid2", "tb"),
            col("user_id") === col("uid2") && col("ta") < col("tb"))
          .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_ab"))
          .join(broadcast(per.toDF("ta", "na")), "ta")
          .join(broadcast(per.toDF("tb", "nb")), "tb")
          .crossJoin(broadcast(nTot))
          .select(col("ta"), col("tb"), col("n_ab"),
            expr("(n_ab * 1000000) div nu").as("support_ppm"),
            expr("(n_ab * nu * 1000000) div (na * nb)").as("lift_ppm"))
      },
      Some("""WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
        t AS (SELECT count(DISTINCT user_id)::BIGINT nu FROM b),
        per AS (SELECT event_type, count(*)::BIGINT n FROM b GROUP BY 1),
        ab AS (SELECT x.event_type ta, y.event_type tb, count(*)::BIGINT n_ab
               FROM b x JOIN b y ON x.user_id = y.user_id
                 AND x.event_type < y.event_type
               GROUP BY 1, 2)
        SELECT ta, tb, n_ab,
          CAST(n_ab * 1000000 // t.nu AS BIGINT) support_ppm,
          CAST(n_ab * t.nu * 1000000 // (pa.n * pb.n) AS BIGINT) lift_ppm
        FROM ab JOIN per pa ON ab.ta = pa.event_type
          JOIN per pb ON ab.tb = pb.event_type
          CROSS JOIN t""")
    ),

    // ── Burstiness profile: per user, the squared coefficient of
    //    variation of inter-event gaps — CV² = 1 is a memoryless Poisson
    //    stream, CV² ≫ 1 is bursty (sessions), CV² ≪ 1 is a metronome
    //    (bots). Gaps collapse to whole SECONDS once (the float→int
    //    collapse), then CV² is the closed form
    //    (n·Σd² − (Σd)²)·10⁶ div (Σd)² — numerator ≥ 0 by
    //    Cauchy–Schwarz, big products in DECIMAL(38,0). One lead window
    //    per user + one aggregate; the q99 bounded-history contract.
    QueryDef(
      "q176_burstiness",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            unix_micros(col("ts")).as("us"))
          .withColumn("nxt", lead(col("us"), 1).over(w))
          .where(col("nxt").isNotNull)
          .select(col("user_id"), expr("(nxt - us) div 1000000").as("d"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_gaps"),
            sum(expr("CAST(d AS DECIMAL(38,0))")).as("sd"),
            sum(expr("CAST(d*d AS DECIMAL(38,0))")).as("sd2"))
          .where(col("n_gaps") >= 2 && col("sd") > 0)
          .select(col("user_id"), col("n_gaps"),
            expr("CAST(sd div n_gaps AS BIGINT)").as("mean_gap_s"),
            expr("CAST(((n_gaps*sd2 - sd*sd) * 1000000) div (sd*sd) AS BIGINT)")
              .as("cv2_ppm"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) t,
                 epoch_us(CAST(ts AS TIMESTAMP)) us
               FROM events),
        g AS (SELECT user_id,
                (lead(us) OVER (PARTITION BY user_id ORDER BY t, event_id) - us)
                  // 1000000 d
              FROM e),
        a AS (SELECT user_id, count(*)::HUGEINT n_gaps,
                sum(d)::HUGEINT sd, sum(d*d)::HUGEINT sd2
              FROM g WHERE d IS NOT NULL GROUP BY 1)
        SELECT user_id, CAST(n_gaps AS BIGINT) n_gaps,
          CAST(sd // n_gaps AS BIGINT) mean_gap_s,
          CAST(((n_gaps*sd2 - sd*sd) * 1000000) // (sd*sd) AS BIGINT) cv2_ppm
        FROM a WHERE n_gaps >= 2 AND sd > 0""")
    ),

    // ── Grouped top-K through the CUSTOM TYPED AGGREGATE (functions/
    //    TopKAggregate): per event type, the 5 highest-value events via
    //    the bounded-buffer Aggregator — the aggregation-shaped top-k
    //    whose partial buffers ship at most K pairs per group per task
    //    (map-side combine does the pruning; a window form shuffles the
    //    whole corpus then discards all but K·groups rows). Ordering
    //    (cents desc, id asc) makes ties engine-free; the kryo-encoded
    //    buffer flattens back to relational rows via a typed flatMap.
    QueryDef(
      "q177_grouped_topk",
      (s, d) => {
        import s.implicits._
        val ds = events(s, d)
          .select(col("event_type"),
            col("event_id"),
            expr("CAST(round(value * 100) AS DOUBLE)").as("score"))
          .as[(String, Long, Double)]
        ds.groupByKey(_._1)
          .mapValues(t => (t._2, t._3))
          .agg(new graft.functions.TopKAggregate(5).toColumn)
          .flatMap { case (tpe, top) =>
            top.zipWithIndex.map { case ((id, score), i) =>
              (tpe, (i + 1).toLong, id, score.toLong)
            }
          }
          .toDF("event_type", "rank", "event_id", "cents")
      },
      Some("""SELECT event_type, rn AS rank, event_id, c AS cents FROM (
          SELECT event_type, event_id, CAST(round(value*100) AS BIGINT) c,
            row_number() OVER (PARTITION BY event_type
              ORDER BY CAST(round(value*100) AS BIGINT) DESC, event_id ASC) rn
          FROM events)
        WHERE rn <= 5"""
    )
    ),

    // ── Daily latency-band dashboard: P50/P95/P99 of value-cents per
    //    event DAY — the SLO table every ops team keeps, as ONE
    //    rankSelectMultiByKey pass keyed by day (the q123/q162 bucketed
    //    rank-select: a corpus bucket-count aggregate + a grid cumsum —
    //    never a per-day sort, never a corpus-sized window partition).
    //    Exact ceil-rank order statistics; 30 output rows.
    QueryDef(
      "q178_daily_bands",
      (s, d) => {
        val pts = events(s, d)
          .select(to_date(col("ts")).cast(StringType).as("day"),
            expr("CAST(round(value * 100) AS DOUBLE)").as("v"))
        val qs = graft.operators.RobustStats.rankSelectMultiByKey(
          pts, "day", "v", Seq((1, 2, "p50"), (19, 20, "p95"), (99, 100, "p99")))
        qs.groupBy(col("day"))
          .agg(max(when(col("_q") === "p50", col("_value"))).cast(LongType).as("p50_cents"),
            max(when(col("_q") === "p95", col("_value"))).cast(LongType).as("p95_cents"),
            max(when(col("_q") === "p99", col("_value"))).cast(LongType).as("p99_cents"))
          .orderBy(col("day"))
      },
      Some("""WITH p AS (SELECT CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS VARCHAR) dd,
                 CAST(round(value*100) AS BIGINT) c
               FROM events),
        rk AS (SELECT dd, c,
                 row_number() OVER (PARTITION BY dd ORDER BY c) rn,
                 count(*) OVER (PARTITION BY dd) n
               FROM p),
        b AS (SELECT dd,
                min(CASE WHEN rn >= (n * 1 + 1) // 2 THEN c END) p50_cents,
                min(CASE WHEN rn >= (n * 19 + 19) // 20 THEN c END) p95_cents,
                min(CASE WHEN rn >= (n * 99 + 99) // 100 THEN c END) p99_cents
              FROM rk GROUP BY 1)
        SELECT dd AS day, p50_cents, p95_cents, p99_cents FROM b ORDER BY dd""")
    )
  )
}
