package graft.queries

import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 tranche: distribution-drift statistics and robust estimators —
  * the monitoring layer a 100 TB training-data pipeline runs BETWEEN
  * ingest and training. Two-sample KS drift, pairwise total-variation
  * distance between source unigram mixtures, lexical-diversity profiling,
  * a Benford first-digit audit, winsorized robust means, largest-remainder
  * budget apportionment, cross-source n-gram novelty, and per-key rolling
  * medians.
  *
  * House determinism discipline (NOTES.md): money/doubles collapse to
  * integer cents once (`round(x*100)` — both engines IEEE-evaluate the
  * same literal arithmetic), every ratio is integer ppm by floor division,
  * any sum that could exceed 2^63 at corpus scale runs as DECIMAL(38,0),
  * and no `log`/float-sum ever reaches a hashed column.
  */
object StatQueries {

  private val P = graft.functions.TextFunctions.HashPrime

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "documents")
  private def events(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "events")

  /** Exact 2-dp doubles → integer cents; the one float→int collapse. */
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * lit(100)).cast(LongType)

  /** Per-(source, word) counts — the shared base of q131/q132.
    * Deliberately NOT cached (r18): materializing the vocab-sized table
    * cost more than each consumer re-running the tokenize+count (q131
    * 0.88 → 0.61 s min, q132 0.35 → 0.30 after removal) — the same
    * recompute-beats-materialize result as q136/q174.
    */
  private def unigrams(s: org.apache.spark.sql.SparkSession, d: String) =
    docs(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("n"))

  private val unigramsSql =
    """u AS (SELECT source, w, count(*)::BIGINT n FROM
         (SELECT source, unnest(string_split(text, ' ')) w FROM documents)
       WHERE len(w) > 0 GROUP BY 1, 2)"""

  val defs: Seq[QueryDef] = Seq(

    // ── Two-sample Kolmogorov–Smirnov drift statistic between the `value`
    //    distributions of two event populations (click vs purchase) — the
    //    distribution-shift alarm a pipeline runs when a new ingest batch
    //    lands. D = max_v |F_a(v) − F_b(v)| computed EXACTLY in integer
    //    ppm: values collapse to cents, per-value counts are ONE hash
    //    aggregate over the corpus (map-side combine), and the cumulative
    //    sums run two-phase exactly like q96's global rank — shard-local
    //    running sums within a 1000-cent bucket plus a cumulative offset
    //    from the tiny per-bucket table. No corpus-sized single-partition
    //    window anywhere: at 100 TB the only global stage is the
    //    #buckets-row offset cum-sum. |cumA·nB − cumB·nA| stays in
    //    DECIMAL(38,0) so count products can't overflow at corpus scale.
    QueryDef(
      "q130_ks_drift",
      (s, d) => {
        val pts = events(s, d)
          .where(col("event_type").isin("click", "purchase"))
          .select(cents(col("value")).as("c"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("ia"))
        // O(distinct cents) histogram consumed THREE times (bucket
        // offsets, totals, the per-cent cumsum) — each re-ran the events
        // scan + aggregate; checkpoint once (tiny post-agg table, r18)
        val perv = pts.groupBy(col("c"))
          .agg(sum(col("ia")).as("an"), sum(lit(1L) - col("ia")).as("bn"))
          .withColumn("bkt", expr("c div 1000"))
          .localCheckpoint(false)
        val offs = perv.groupBy(col("bkt"))
          .agg(sum(col("an")).as("ba"), sum(col("bn")).as("bb"))
          .select(col("bkt"),
            coalesce(sum(col("ba")).over(
              Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)).as("offa"),
            coalesce(sum(col("bb")).over(
              Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)).as("offb"))
        val wb = Window.partitionBy(col("bkt")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val tot = perv.agg(sum(col("an")).as("na"), sum(col("bn")).as("nb"))
        perv
          .join(broadcast(offs), "bkt")
          .select(col("c"),
            (col("offa") + sum(col("an")).over(wb)).as("ca"),
            (col("offb") + sum(col("bn")).over(wb)).as("cb"))
          .crossJoin(broadcast(tot))
          .groupBy(col("na"), col("nb"))
          .agg(max(abs(col("ca").cast(DecimalType(38, 0)) * col("nb")
            - col("cb").cast(DecimalType(38, 0)) * col("na"))).as("dmax"))
          .select(col("na"), col("nb"),
            expr("CAST((dmax * 1000000) div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)")
              .as("d_ppm"))
      },
      Some("""WITH p AS (SELECT CAST(round(value*100) AS BIGINT) c,
                 CASE WHEN event_type = 'click' THEN 1 ELSE 0 END ia
               FROM events WHERE event_type IN ('click', 'purchase')),
        v AS (SELECT c, sum(ia)::BIGINT an, sum(1-ia)::BIGINT bn FROM p GROUP BY 1),
        t AS (SELECT sum(an)::BIGINT na, sum(bn)::BIGINT nb FROM v),
        cm AS (SELECT sum(an) OVER (ORDER BY c)::BIGINT ca,
                      sum(bn) OVER (ORDER BY c)::BIGINT cb FROM v)
        SELECT t.na, t.nb,
          CAST(max(abs(cm.ca*t.nb - cm.cb*t.na)) * 1000000 // (t.na*t.nb) AS BIGINT) AS d_ppm
        FROM cm CROSS JOIN t GROUP BY t.na, t.nb""")
    ),

    // ── Pairwise total-variation distance between per-source unigram
    //    distributions — the mixture-drift matrix (is src3's vocabulary
    //    distribution diverging from src7's?). TV needs the FULL outer
    //    vocabulary per pair, but the join only ever touches SHARED words:
    //    TV = [Σ_shared |n1·N2 − n2·N1| + (N1−s1)·N2 + (N2−s2)·N1] / 2·N1·N2,
    //    where s1/s2 are shared-mass sums — the one-sided tails fall out of
    //    the totals algebraically. So the plan is one unigram aggregate,
    //    one word equi-join (pair fan-out bounded by sources sharing the
    //    word, the quantity being measured), broadcast totals. Count
    //    products run as DECIMAL(38,0): at 100 TB, n·N ~ 1e9·1e13 > 2^63.
    QueryDef(
      "q131_tvd_drift",
      (s, d) => {
        val u = unigrams(s, d)
        val totals = u.groupBy(col("source")).agg(sum(col("n")).as("nt"))
        val pairs = u.toDF("s1", "w", "n1")
          .join(u.toDF("s2", "w2", "n2"), col("w") === col("w2") && col("s1") < col("s2"))
          .join(broadcast(totals.toDF("s1", "nt1")), "s1")
          .join(broadcast(totals.toDF("s2", "nt2")), "s2")
          .groupBy(col("s1"), col("s2"), col("nt1"), col("nt2"))
          .agg(
            sum(abs(col("n1").cast(DecimalType(38, 0)) * col("nt2")
              - col("n2").cast(DecimalType(38, 0)) * col("nt1"))).as("diff"),
            sum(col("n1").cast(DecimalType(38, 0))).as("sm1"),
            sum(col("n2").cast(DecimalType(38, 0))).as("sm2"))
        pairs.select(col("s1"), col("s2"),
          expr("""CAST((diff + (CAST(nt1 AS DECIMAL(38,0)) - sm1) * nt2
                             + (CAST(nt2 AS DECIMAL(38,0)) - sm2) * nt1) * 1000000
                    div (2 * CAST(nt1 AS DECIMAL(38,0)) * nt2) AS BIGINT)""").as("tv_ppm"))
      },
      Some(s"""WITH $unigramsSql,
        t AS (SELECT source, sum(n)::BIGINT nt FROM u GROUP BY 1),
        pr AS (SELECT a.source s1, b.source s2, ta.nt nt1, tb.nt nt2,
                 sum(abs(a.n*tb.nt - b.n*ta.nt)) diff,
                 sum(a.n)::BIGINT sm1, sum(b.n)::BIGINT sm2
               FROM u a JOIN u b ON a.w = b.w AND a.source < b.source
               JOIN t ta ON ta.source = a.source
               JOIN t tb ON tb.source = b.source
               GROUP BY 1, 2, 3, 4)
        SELECT s1, s2,
          CAST((diff + (nt1 - sm1)*nt2 + (nt2 - sm2)*nt1) * 1000000
               // (2*nt1*nt2) AS BIGINT) AS tv_ppm
        FROM pr""")
    ),

    // ── Lexical-diversity profile per source: token count, type count,
    //    type-token ratio, and hapax-legomena share — the cheap vocabulary-
    //    health panel (a source whose TTR collapses is boilerplate; one
    //    whose hapax share explodes is OCR noise). One narrow aggregate
    //    over the cached unigram table q131 already built.
    QueryDef(
      "q132_lexical_diversity",
      (s, d) => unigrams(s, d)
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
          expr("(n_types * 1000000) div n_tokens").as("ttr_ppm"),
          expr("(n_hapax * 1000000) div n_types").as("hapax_ppm")),
      Some(s"""WITH $unigramsSql
        SELECT source, sum(n)::BIGINT n_tokens, count(*)::BIGINT n_types,
          sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT n_hapax,
          CAST(count(*) * 1000000 // sum(n) AS BIGINT) AS ttr_ppm,
          CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
            AS hapax_ppm
        FROM u GROUP BY source""")
    ),

    // ── Benford first-digit audit over lineitem extended prices — the
    //    data-forensics op that flags fabricated or truncated numeric
    //    columns before they poison downstream stats. Digit extraction is
    //    string-first (integer cents → decimal string → first char): both
    //    engines render integers identically, where float log10/pow tricks
    //    diverge. Expected Benford mass log10(1+1/d) ships as nine integer
    //    ppm literals (precomputed constants — no runtime log). One narrow
    //    scan + 9-row aggregate; deviation in ppm.
    QueryDef(
      "q133_benford",
      (s, d) => {
        val exp = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)
        val li = Tables.load(s, d, "lineitem")
          .select(substring(cents(col("l_extendedprice")).cast(StringType), 1, 1)
            .cast(IntegerType).as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        li.crossJoin(broadcast(li.agg(sum(col("n")).as("tot"))))
          .select(col("digit"), col("n"),
            expr("(n * 1000000) div tot").as("obs_ppm"),
            element_at(array(exp.map(lit): _*), col("digit")).as("exp_ppm"))
          .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
      },
      Some("""WITH d AS (SELECT CAST(substr(CAST(CAST(round(l_extendedprice*100) AS BIGINT)
                   AS VARCHAR), 1, 1) AS INT) digit
               FROM lineitem),
        g AS (SELECT digit, count(*)::BIGINT n FROM d GROUP BY 1),
        t AS (SELECT sum(n)::BIGINT tot FROM g),
        e AS (SELECT unnest(generate_series(1, 9)) digit,
                     unnest([301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]) exp_ppm)
        SELECT g.digit, g.n, CAST(g.n * 1000000 // t.tot AS BIGINT) AS obs_ppm,
          e.exp_ppm::BIGINT AS exp_ppm,
          CAST(abs(g.n * 1000000 // t.tot - e.exp_ppm) AS BIGINT) AS dev_ppm
        FROM g CROSS JOIN t JOIN e ON e.digit = g.digit""")
    ),

    // ── Winsorized robust mean per event type: clamp values to the exact
    //    [p10, p90] order statistics, then average — the outlier-proof KPI.
    //    The corpus is touched ONCE by a (type, cents) hash aggregate;
    //    quantile thresholds come from a cumulative window over that
    //    value-histogram table (dimension-sized — distinct cents, not
    //    rows, exactly q107's bucketed rank-select discipline), broadcast
    //    back, and the winsorized sum is Σ n·clamp(c) over the same
    //    histogram — the raw corpus is never rescanned or sorted. Ranks
    //    are ceil(q·N) order statistics: integer-exact, no interpolation.
    QueryDef(
      "q134_winsorized_mean",
      (s, d) => {
        val vc = events(s, d)
          .select(col("event_type"), cents(col("value")).as("c"))
          .groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("n"))
          .cache()
        val tot = vc.groupBy(col("event_type")).agg(sum(col("n")).as("nt"))
        val wc = Window.partitionBy(col("event_type")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = vc.withColumn("cum", sum(col("n")).over(wc))
          .join(broadcast(tot), "event_type")
        // BOTH order statistics from ONE pass over the cumsum: the lo/hi
        // sub-dataframes each re-ran the window + join (two full passes,
        // two broadcast joins downstream — the q123 duplicated-rank-select
        // disease in two-fraction form; r18, guide §2.4). min(when(...))
        // ignores rows below the rank exactly like the filtered form.
        val bounds = cum.groupBy(col("event_type")).agg(
          min(when(col("cum") >= expr("(nt + 9) div 10"), col("c"))).as("lo"),
          min(when(col("cum") >= expr("(9 * nt + 9) div 10"), col("c"))).as("hi"))
        vc.join(broadcast(bounds), "event_type")
          .select(col("event_type"), col("n"), col("lo"), col("hi"),
            greatest(col("lo"), least(col("hi"), col("c"))).as("cc"))
          .groupBy(col("event_type"), col("lo"), col("hi"))
          .agg(sum(col("n")).as("n_events"), sum(col("cc") * col("n")).as("wsum"))
          .select(col("event_type"), col("n_events"),
            col("lo").as("lo_cents"), col("hi").as("hi_cents"),
            expr("wsum div n_events").as("wmean_cents"))
      },
      Some("""WITH vc AS (SELECT event_type, CAST(round(value*100) AS BIGINT) c,
                 count(*)::BIGINT n
               FROM events GROUP BY 1, 2),
        t AS (SELECT event_type, sum(n)::BIGINT nt FROM vc GROUP BY 1),
        cm AS (SELECT vc.event_type, vc.c, vc.n, t.nt,
                 sum(vc.n) OVER (PARTITION BY vc.event_type ORDER BY vc.c)::BIGINT cum
               FROM vc JOIN t USING (event_type)),
        lo AS (SELECT event_type, min(c) lo FROM cm WHERE cum >= (nt + 9) // 10 GROUP BY 1),
        hi AS (SELECT event_type, min(c) hi FROM cm WHERE cum >= (9*nt + 9) // 10 GROUP BY 1)
        SELECT vc.event_type, sum(vc.n)::BIGINT n_events,
          lo.lo AS lo_cents, hi.hi AS hi_cents,
          CAST(sum(greatest(lo.lo, least(hi.hi, vc.c)) * vc.n)
               // sum(vc.n) AS BIGINT) AS wmean_cents
        FROM vc JOIN lo USING (event_type) JOIN hi USING (event_type)
        GROUP BY vc.event_type, lo.lo, hi.hi""")
    ),

    // ── Largest-remainder (Hamilton) apportionment of a fixed sampling
    //    budget across sources — the EXACT-total companion to q94's
    //    rate-based rebalance: Σ alloc = K by construction, ties broken
    //    deterministically (remainder desc, source asc). All integer
    //    arithmetic on the 20-row source dimension; the corpus contributes
    //    one count aggregate. This is how a pipeline turns "sample 10k
    //    docs proportionally" into per-source quotas that actually sum
    //    to 10k.
    QueryDef(
      "q135_apportion",
      (s, d) => {
        val k = 10000L
        val g = docs(s, d).groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        val tot = g.agg(sum(col("n_docs")).as("nt"), sum(lit(1)).as("ns"))
        val base = g.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"),
            expr(s"($k * n_docs) div nt").as("floor_alloc"),
            expr(s"($k * n_docs) % nt").as("rem"))
        val leftover = base.agg((lit(k) - sum(col("floor_alloc"))).as("lv"))
        base.crossJoin(broadcast(leftover))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("rem").desc, col("source").asc)))
          .select(col("source"), col("n_docs"),
            (col("floor_alloc") + when(col("rk") <= col("lv"), 1L).otherwise(0L))
              .as("alloc"))
      },
      Some("""WITH g AS (SELECT source, count(*)::BIGINT n_docs FROM documents GROUP BY 1),
        t AS (SELECT sum(n_docs)::BIGINT nt FROM g),
        b AS (SELECT source, n_docs,
                CAST(10000 * n_docs // nt AS BIGINT) floor_alloc,
                CAST(10000 * n_docs % nt AS BIGINT) rem
              FROM g CROSS JOIN t),
        l AS (SELECT CAST(10000 - sum(floor_alloc) AS BIGINT) lv FROM b),
        r AS (SELECT b.*, l.lv,
                row_number() OVER (ORDER BY rem DESC, source ASC) rk
              FROM b CROSS JOIN l)
        SELECT source, n_docs,
          (floor_alloc + CASE WHEN rk <= lv THEN 1 ELSE 0 END)::BIGINT AS alloc
        FROM r""")
    ),

    // ── Cross-source n-gram NOVELTY — the asymmetric complement of q125's
    //    contamination matrix: what fraction of a source's distinct
    //    3-grams appears in NO other source? (High novelty = genuinely new
    //    data worth ingesting; low = the source is re-crawling the web.)
    //    Plan: one fused tokenize→gram-hash pass, per-source DISTINCT,
    //    then a gram-level source-count aggregate joined back — all equi,
    //    candidate volume bounded by actual sharing. Never a source×source
    //    product.
    QueryDef(
      "q136_ngram_novelty",
      (s, d) => {
        // deliberately NOT cached (r18): both consumers sit directly on
        // the distinct's exchange, so ReuseExchange serves the join probe
        // from the same shuffle files the aggregate read — the cache only
        // added an in-memory materialization pass (measured 1.07 → 0.61 s
        // min after removal)
        val g = docs(s, d)
          .select(col("source"),
            explode(graft.functions.HashExpressions.shingleHash32(
              tokens(col("text")), 3)).as("g"))
          .distinct()
        val spread = g.groupBy(col("g")).agg(count(lit(1)).as("nsrc"))
        g.join(spread, "g")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("nsrc") === 1, 1L).otherwise(0L)).as("n_unique"))
          .select(col("source"), col("n_grams"), col("n_unique"),
            expr("(n_unique * 1000000) div n_grams").as("novelty_ppm"))
      },
      Some(s"""WITH t AS (SELECT source, string_split(text,' ') t FROM documents),
        g AS (SELECT DISTINCT source, gh FROM (
            SELECT source, unnest(list_transform(
                list_transform(range(0, len(t)-2),
                  j -> t[j+1]||' '||t[j+2]||' '||t[j+3]),
                x -> ('0x'||substr(md5(x),1,8))::BIGINT % $P)) gh
            FROM t WHERE len(t) >= 3)),
        sp AS (SELECT gh, count(*)::BIGINT nsrc FROM g GROUP BY 1)
        SELECT g.source, count(*)::BIGINT n_grams,
          sum(CASE WHEN sp.nsrc = 1 THEN 1 ELSE 0 END)::BIGINT n_unique,
          CAST(sum(CASE WHEN sp.nsrc = 1 THEN 1 ELSE 0 END) * 1000000
               // count(*) AS BIGINT) AS novelty_ppm
        FROM g JOIN sp USING (gh) GROUP BY 1""")
    ),

    // ── Q-Q decile table between two event populations: WHERE do the
    //    click and purchase value distributions diverge? (q130's KS gives
    //    one number; this localizes the gap by decile.) All nine order
    //    statistics for BOTH populations come from ONE
    //    rankSelectMultiByKey pass keyed by event type — the shared
    //    bucket-count aggregate + grid cumsum of q123 — then a 9-row
    //    pivot. Exact ceil-rank values in cents; gap is integer.
    QueryDef(
      "q162_qq_table",
      (s, d) => {
        val pts = events(s, d)
          .where(col("event_type").isin("click", "purchase"))
          .select(col("event_type"), cents(col("value")).cast(DoubleType).as("v"))
        val fracs = (1 to 9).map(i => (i, 10, s"d$i"))
        // 18 rows (2 types × 9 deciles) — lazily checkpointed because the
        // click/purchase pivot self-join below consumes it TWICE: without
        // the checkpoint each side re-embeds the whole rank-select
        // machinery and the declared plan read 40 parquet scans (r18,
        // guide §2.4); with it, 2. Same exact values, O(deciles) state.
        val qs = graft.operators.RobustStats.rankSelectMultiByKey(
          pts, "event_type", "v", fracs).localCheckpoint(false)
        val dec = qs.select(col("event_type"), col("_q"),
          col("_value").cast(LongType).as("c"))
        dec.where(col("event_type") === "click")
          .select(col("_q"), col("c").as("click_cents"))
          .join(dec.where(col("event_type") === "purchase")
            .select(col("_q"), col("c").as("purchase_cents")), "_q")
          .select(expr("CAST(substring(_q, 2) AS INT)").as("decile"),
            col("click_cents"), col("purchase_cents"),
            (col("purchase_cents") - col("click_cents")).as("gap_cents"))
          .orderBy(col("decile"))
      },
      Some("""WITH p AS (SELECT event_type, CAST(round(value*100) AS BIGINT) c
               FROM events WHERE event_type IN ('click', 'purchase')),
        rk AS (SELECT event_type, c,
                 row_number() OVER (PARTITION BY event_type ORDER BY c) rn,
                 count(*) OVER (PARTITION BY event_type) n
               FROM p),
        b AS (SELECT event_type, k, min(c) v
              FROM rk CROSS JOIN (SELECT unnest(range(1, 10)) k)
              WHERE rn >= (n * k + 9) // 10 GROUP BY 1, 2)
        SELECT CAST(a.k AS INT) decile, a.v click_cents, b.v purchase_cents,
          (b.v - a.v)::BIGINT gap_cents
        FROM b a JOIN b b ON a.k = b.k
          AND a.event_type = 'click' AND b.event_type = 'purchase'
        ORDER BY decile""")
    ),

    // ── Exact Gini coefficient per event type — the inequality measure
    //    that pairs with q117's HHI (concentration of revenue across
    //    transactions rather than across holders). Sort-free: with the
    //    (cents → count) histogram, the rank sum of a value group is
    //    f·cumBefore + f(f+1)/2, so Σ rank·x comes from ONE cumulative
    //    over the dimension-sized histogram (q134's shape) and
    //    G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx), all integer until the
    //    final ppm division. DECIMAL(38,0) products — rank·value·count
    //    exceeds 2^63 at corpus scale.
    QueryDef(
      "q163_gini",
      (s, d) => {
        val dec = DecimalType(38, 0)
        val h = events(s, d)
          .select(col("event_type"), cents(col("value")).as("v"))
          .groupBy(col("event_type"), col("v")).agg(count(lit(1)).as("f"))
        val wc = Window.partitionBy(col("event_type")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)
        // srx2 = 2·Σ rank·x = Σ v·(2·f·cumBefore + f·(f+1)) — the doubled
        // form needs no halving, so everything stays in DECIMAL products
        h.withColumn("cumb", coalesce(sum(col("f")).over(wc), lit(0L)))
          .groupBy(col("event_type"))
          .agg(sum(col("f")).as("n"),
            sum(col("v").cast(dec) * col("f")).as("sx"),
            sum(col("v").cast(dec) *
              (col("f").cast(dec) * col("cumb") * 2
                + col("f").cast(dec) * (col("f") + 1))).as("srx2"))
          .select(col("event_type"), col("n").cast(LongType).as("n"),
            expr("""CAST((srx2 - (CAST(n AS DECIMAL(38,0)) + 1) * sx) * 1000000
                      div (CAST(n AS DECIMAL(38,0)) * sx) AS BIGINT)""").as("gini_ppm"))
      },
      Some("""WITH h AS (SELECT event_type, CAST(round(value*100) AS BIGINT) v,
                 count(*)::BIGINT f
               FROM events GROUP BY 1, 2),
        c AS (SELECT event_type, v, f,
                coalesce(sum(f) OVER (PARTITION BY event_type ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT cumb
              FROM h),
        g AS (SELECT event_type, sum(f)::HUGEINT n, sum(v::HUGEINT * f)::HUGEINT sx,
                sum(v::HUGEINT * (f::HUGEINT * cumb * 2 + f::HUGEINT * (f + 1)))::HUGEINT srx2
              FROM c GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) n,
          CAST((srx2 - (n + 1)*sx) * 1000000 // (n*sx) AS BIGINT) gini_ppm
        FROM g""")
    ),

    // ── Top-percentile concentration: what share of total value do the
    //    top 1% / 5% / 10% of transactions hold, per event type — the
    //    Lorenz-curve points behind q163's Gini, read the way an analyst
    //    asks for them. Sort-free: descending cumulative (count, value)
    //    over the dimension-sized histogram; the boundary rank
    //    k = ceil(n·p/100) lands in exactly one cell, and the partial
    //    cell contributes (k − cumBefore)·v exactly. Integer throughout,
    //    DECIMAL value products.
    QueryDef(
      "q164_top_share",
      (s, d) => {
        val dec = DecimalType(38, 0)
        val h = events(s, d)
          .select(col("event_type"), cents(col("value")).as("v"))
          .groupBy(col("event_type"), col("v")).agg(count(lit(1)).as("f"))
          .cache()
        val wd = Window.partitionBy(col("event_type")).orderBy(col("v").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = h
          .withColumn("cumf", sum(col("f")).over(wd))
          .withColumn("cumvx", sum(col("v").cast(dec) * col("f")).over(wd))
        val tot = h.groupBy(col("event_type"))
          .agg(sum(col("f")).as("n"), sum(col("v").cast(dec) * col("f")).as("sx"))
        val pdim = {
          import s.implicits._
          Seq(1, 5, 10).toDF("pct")
        }
        cum.join(broadcast(tot), "event_type")
          .crossJoin(broadcast(pdim))
          .withColumn("k", expr("(n * pct + 99) div 100"))
          .where(col("cumf") >= col("k")
            && col("cumf") - col("f") < col("k"))
          .select(col("event_type"), col("pct"), col("n"), col("k").as("n_top"),
            expr("""CAST((cumvx - (CAST(cumf AS DECIMAL(38,0)) - k) * v) * 1000000
                      div sx AS BIGINT)""").as("share_ppm"))
          .orderBy(col("event_type"), col("pct"))
      },
      Some("""WITH h AS (SELECT event_type, CAST(round(value*100) AS BIGINT) v,
                 count(*)::BIGINT f
               FROM events GROUP BY 1, 2),
        c AS (SELECT event_type, v, f,
                sum(f) OVER (PARTITION BY event_type ORDER BY v DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT cumf,
                sum(v::HUGEINT * f) OVER (PARTITION BY event_type ORDER BY v DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cumvx
              FROM h),
        t AS (SELECT event_type, sum(f)::BIGINT n, sum(v::HUGEINT * f) sx
              FROM h GROUP BY 1),
        p AS (SELECT unnest([1, 5, 10]) pct),
        j AS (SELECT c.event_type, p.pct, t.n,
                (t.n * p.pct + 99) // 100 k, c.v, c.f, c.cumf, c.cumvx, t.sx
              FROM c JOIN t USING (event_type) CROSS JOIN p)
        SELECT event_type, CAST(pct AS INT) pct, n, CAST(k AS BIGINT) n_top,
          CAST((cumvx - (cumf - k)::HUGEINT * v) * 1000000 // sx AS BIGINT) share_ppm
        FROM j WHERE cumf >= k AND cumf - f < k
        ORDER BY event_type, pct""")
    ),

    // ── Rolling median smoother: per-user lower median of the last 5
    //    event values in time order — the robust time-series denoiser
    //    (EWMA q109's outlier-proof sibling). Bounded 5-row frame, window
    //    partitioned by user (100 TB: millions of users, perfect
    //    parallelism; frame size is a constant, not history length).
    //    Lower median = element (k+1)/2 of the sorted frame: exact,
    //    no even-count averaging, ties in ts broken by event_id so both
    //    engines walk identical frames. Output capped to a 30-user panel.
    QueryDef(
      "q137_rolling_median",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id")).rowsBetween(-4, 0)
        events(s, d)
          .where(col("user_id") < 30)
          .select(col("event_id"), col("user_id"), col("ts"), cents(col("value")).as("c"))
          .withColumn("arr", sort_array(collect_list(col("c")).over(w)))
          .select(col("event_id"), col("user_id"), col("c").as("cents"),
            element_at(col("arr"),
              expr("CAST((size(arr) + 1) div 2 AS INT)")).as("med_cents"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, ts,
                 CAST(round(value*100) AS BIGINT) c
               FROM events WHERE user_id < 30),
        f AS (SELECT event_id, user_id, c,
                list_sort(list(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) arr
              FROM e)
        SELECT event_id, user_id, c AS cents,
          arr[(len(arr) + 1) // 2] AS med_cents
        FROM f""")
    ),

    // ── Per-population OLS trend: the least-squares slope of value-cents
    //    over time for each event type — "is spend drifting up?" as ONE
    //    hash aggregate. Exactness the house way: x collapses to whole
    //    seconds since 2024-01-01, y to cents, the five sufficient
    //    statistics (n, Σx, Σy, Σxy, Σx²) accumulate in DECIMAL(38,0)
    //    (count products pass 2^63 at corpus scale), and the closed-form
    //    slope (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) lands as integer nano-cents/sec
    //    via the shift-then-floor-divide trick (q153's rule: Spark `div`
    //    truncates, DuckDB `//` floors; they agree only on non-negative
    //    numerators, so shift by 10¹²·den first). 100 TB: a 5-number
    //    map-side-combined aggregate per group — the cheapest possible
    //    shape; no window, no join, no second pass.
    //    Headroom contract (ADVICE r5): the slope numerator n·Σxy·10⁹ sits
    //    in DECIMAL(38,0) ≈ 10³⁸; with |x| ≤ 10⁸ s and |y| ≤ 10⁷ cents
    //    that is exact while a group holds < ~10⁷ rows (n·Σxy ≤
    //    10⁷·10⁷·10¹⁵ = 10²⁹, shifted 10⁹ → 10³⁸ boundary). Past that,
    //    Spark (ANSI off) nulls the overflow while DuckDB HUGEINT errors —
    //    so per-group cardinality above ~1e7 requires dropping the nano
    //    shift to micro (10⁶), which this query does NOT do by default.
    QueryDef(
      "q171_trend_lines",
      (s, d) => events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 1000000 - 1704067200").as("x"),
          cents(col("value")).as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast(DecimalType(38, 0)).as("n"),
          sum(col("x").cast(DecimalType(38, 0))).as("sx"),
          sum(col("y").cast(DecimalType(38, 0))).as("sy"),
          sum(expr("CAST(x * y AS DECIMAL(38,0))")).as("sxy"),
          sum(expr("CAST(x * x AS DECIMAL(38,0))")).as("sxx"))
        .where(expr("n >= 2 AND n * sxx - sx * sx <> 0"))
        .select(col("event_type"), col("n").cast(LongType).as("n"),
          expr("""CAST(((n*sxy - sx*sy) * 1000000000
                   + 1000000000000 * (n*sxx - sx*sx)) div (n*sxx - sx*sx)
                  - 1000000000000 AS BIGINT)""").as("slope_nano")),
      Some("""WITH e AS (SELECT event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 - 1704067200 x,
                 CAST(round(value*100) AS BIGINT) y
               FROM events),
        a AS (SELECT event_type, count(*)::HUGEINT n,
                sum(x)::HUGEINT sx, sum(y)::HUGEINT sy,
                sum(x*y)::HUGEINT sxy, sum(x*x)::HUGEINT sxx
              FROM e GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) n,
          CAST(((n*sxy - sx*sy) * 1000000000
                + 1000000000000 * (n*sxx - sx*sx)) // (n*sxx - sx*sx)
               - 1000000000000 AS BIGINT) slope_nano
        FROM a WHERE n >= 2 AND n*sxx - sx*sx <> 0""")
    ),

    // ── CUSUM changepoint scan: per user, the classic one-sided CUSUM
    //    s_i = max(0, s_{i−1} + (c_i − k)) over the (ts, id)-sorted cents
    //    stream, k = 5000 allowance — did any user's spend level SHIFT?
    //    The fold is re-expressed as pure prefix algebra so it runs in
    //    parallel windows instead of a sequential reduce: with
    //    P_i = Σ_{j≤i}(c_j − k) and P_0 = 0,
    //    s_i = P_i − min_{j≤i} P_j — a running sum plus a running min,
    //    both per-user windows, all integer cents. max s_i and the alarm
    //    count fall out of one aggregate. 100 TB: windows partition by
    //    user (bounded per-key history, the q99 contract), aggregates
    //    map-side; nothing sequential anywhere.
    QueryDef(
      "q172_cusum",
      (s, d) => {
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            (cents(col("value")) - 5000L).as("x"))
          .withColumn("p", sum(col("x")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
          // s_i = P_i − min(P_0..P_i), P_0 = 0 — the min INCLUDES the
          // current prefix, which is what clamps the statistic at 0
          .withColumn("minrun",
            least(lit(0L), min(col("p")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0))))
          .withColumn("cusum", col("p") - col("minrun"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), max(col("cusum")).as("max_cusum"),
            sum(when(col("cusum") > 20000L, 1L).otherwise(0L)).as("n_alarms"))
          .where(col("max_cusum") > 0)
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) t, event_id,
                 CAST(round(value*100) AS BIGINT) - 5000 x
               FROM events),
        p0 AS (SELECT user_id, t, event_id,
                 sum(x) OVER (PARTITION BY user_id ORDER BY t, event_id
                   ROWS UNBOUNDED PRECEDING)::BIGINT p
               FROM e),
        c AS (SELECT user_id,
                p - least(0, min(p) OVER (PARTITION BY user_id ORDER BY t, event_id
                  ROWS UNBOUNDED PRECEDING)) cusum
              FROM p0)
        SELECT user_id, count(*)::BIGINT n_events, max(cusum)::BIGINT max_cusum,
          sum(CASE WHEN cusum > 20000 THEN 1 ELSE 0 END)::BIGINT n_alarms
        FROM c GROUP BY 1 HAVING max(cusum) > 0""")
    ),

    // ── Kaplan–Meier conversion curve: time-to-first-purchase in days,
    //    users without a purchase right-censored at their last activity —
    //    the estimator that handles "hasn't converted YET" correctly
    //    where a naive conversion rate can't. Per event-day t:
    //    n_risk (users still unconverted and observed), d_t (conversions),
    //    and Ŝ(t) = Π_{u≤t} (n_u − d_u)/n_u. The product is folded in
    //    EXACT integers (parts-per-trillion, truncating div each step —
    //    deterministic in both engines). Spark folds with a higher-order
    //    `aggregate` over the running prefix list; the oracle replays the
    //    IDENTICAL BIGINT recurrence with a recursive CTE (one row per
    //    event-day), which is portable across DuckDB builds — the previous
    //    list_reduce/list_prepend form was the most version-sensitive
    //    construct in the oracle corpus. Headroom contract: the BIGINT
    //    accumulator is 10¹²·n_risk per step, exact while n_risk < 9.2·10⁶
    //    unconverted users on a single event-day; beyond that reduce the
    //    ppt seed (ADVICE r5). 100 TB: the only corpus-sized stage is the per-user
    //    min/max aggregate; the curve machinery runs on ≤ #distinct-days
    //    rows (the tiny-table single-partition window, q151's contract).
    QueryDef(
      "q173_kaplan_meier",
      (s, d) => {
        val u = events(s, d).groupBy(col("user_id"))
          .agg(min(col("ts")).as("first_t"), max(col("ts")).as("last_t"),
            min(when(col("event_type") === "purchase", col("ts"))).as("conv_t"))
        val dd = u.select(
          datediff(coalesce(col("conv_t"), col("last_t")), col("first_t"))
            .cast(LongType).as("dur"),
          when(col("conv_t").isNotNull, 1L).otherwise(0L).as("ev"))
        val tot = dd.agg(count(lit(1)).as("total"))
        val g = dd.groupBy(col("dur"))
          .agg(count(lit(1)).as("ending"), sum(col("ev")).as("d_t"))
        g.crossJoin(broadcast(tot))
          .withColumn("n_risk", col("total") - coalesce(sum(col("ending")).over(
            Window.orderBy(col("dur")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .where(col("d_t") > 0)
          .withColumn("pre", collect_list(col("n_risk") * 100000 + col("d_t")).over(
            Window.orderBy(col("dur")).rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("dur"), col("n_risk"), col("d_t"),
            expr("""aggregate(pre, CAST(1000000000000 AS BIGINT),
              (acc, e) -> (acc * ((e div 100000) - (e % 100000))) div (e div 100000))""")
              .as("surv_ppt"))
          .orderBy(col("dur"))
      },
      Some("""WITH RECURSIVE u AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) first_t,
                 max(CAST(ts AS TIMESTAMP)) last_t,
                 min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) conv_t
               FROM events GROUP BY 1),
        d AS (SELECT date_diff('day', first_t, coalesce(conv_t, last_t))::BIGINT dur,
                (conv_t IS NOT NULL)::INT ev
              FROM u),
        t AS (SELECT count(*)::BIGINT total FROM d),
        g AS (SELECT dur, count(*)::BIGINT ending, sum(ev)::BIGINT d_t
              FROM d GROUP BY 1),
        r AS (SELECT dur, d_t,
                CAST((SELECT total FROM t) - coalesce(sum(ending) OVER (ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) n_risk
              FROM g),
        s AS (SELECT dur, d_t, n_risk,
                row_number() OVER (ORDER BY dur)::BIGINT rn
              FROM r WHERE d_t > 0),
        f AS (SELECT rn, dur, n_risk, d_t,
                (1000000000000::BIGINT * (n_risk - d_t)) // n_risk surv
              FROM s WHERE rn = 1
              UNION ALL
              SELECT s.rn, s.dur, s.n_risk, s.d_t,
                (f.surv * (s.n_risk - s.d_t)) // s.n_risk
              FROM f JOIN s ON s.rn = f.rn + 1)
        SELECT dur, n_risk, d_t, CAST(surv AS BIGINT) surv_ppt
        FROM f ORDER BY dur""")
    ),

    // ── Pairwise cross-source contamination MATRIX: q136 scores each
    //    source's novelty against everyone; this localizes it — for every
    //    source PAIR, the shared trigram count and Jaccard overlap in ppm
    //    (mirror detection, license-leak attribution, "which feed copies
    //    which"). The per-source distinct-gram set is the SAME subtree
    //    q136 builds. The pair join explodes per-gram SOURCE pairs, never
    //    doc pairs — candidate volume is ≤ sources²/2 per gram,
    //    independent of corpus size; union sizes come arithmetically from
    //    the per-source counts (|A∪B| = |A|+|B|−|A∩B|), no second corpus
    //    pass. Deliberately NOT cached (r18, like q136): materializing
    //    the corpus-sized distinct-gram table cost more than its three
    //    consumers re-running the fused tokenize+hash (measured
    //    1.25 → 0.86 s min after removal), and dropping both caches also
    //    drops the cross-entry materialization the module no longer needs.
    QueryDef(
      "q174_source_overlap",
      (s, d) => {
        val g = docs(s, d)
          .select(col("source"),
            explode(graft.functions.HashExpressions.shingleHash32(
              tokens(col("text")), 3)).as("g"))
          .distinct()
        val sizes = g.groupBy(col("source")).agg(count(lit(1)).as("sz"))
        val common = g.toDF("src_a", "g")
          .join(g.toDF("src_b", "g2"), col("g") === col("g2") && col("src_a") < col("src_b"))
          .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("n_common"))
        common
          .join(broadcast(sizes.toDF("src_a", "sza")), "src_a")
          .join(broadcast(sizes.toDF("src_b", "szb")), "src_b")
          .select(col("src_a"), col("src_b"), col("n_common"),
            expr("(n_common * 1000000) div (sza + szb - n_common)").as("jaccard_ppm"))
      },
      Some(s"""WITH t AS (SELECT source, string_split(text,' ') t FROM documents),
        g AS (SELECT DISTINCT source, gh FROM (
            SELECT source, unnest(list_transform(
                list_transform(range(0, len(t)-2),
                  j -> t[j+1]||' '||t[j+2]||' '||t[j+3]),
                x -> ('0x'||substr(md5(x),1,8))::BIGINT % $P)) gh
            FROM t WHERE len(t) >= 3)),
        sz AS (SELECT source, count(*)::BIGINT sz FROM g GROUP BY 1),
        c AS (SELECT a.source src_a, b.source src_b, count(*)::BIGINT n_common
              FROM g a JOIN g b ON a.gh = b.gh AND a.source < b.source
              GROUP BY 1, 2)
        SELECT src_a, src_b, n_common,
          CAST(n_common * 1000000 // (x.sz + y.sz - n_common) AS BIGINT) jaccard_ppm
        FROM c JOIN sz x ON c.src_a = x.source JOIN sz y ON c.src_b = y.source""")
    ),

    // ── Two-proportion A/B test, EXACT: users hash-split 50/50 (the
    //    deterministic q103 discipline — the assignment IS the experiment
    //    arm), conversion = ≥1 purchase, and the pooled two-proportion
    //    z² statistic as an exact rational in counts:
    //    z² = (c₁n₂ − c₂n₁)²·n / (n₁·n₂·c·(n−c)), c = c₁+c₂, n = n₁+n₂ —
    //    no sqrt, no float variance, ppm by DECIMAL floor-div. The
    //    significance verdict (z² > 3.84, χ²₁ at α=0.05) is a pinned
    //    boolean both engines derive from the same integers. One
    //    per-user aggregate + a 2-row reduction: the cheapest possible
    //    experiment readout at any corpus size.
    //    Headroom contract (ADVICE r5): the z² numerator is
    //    (c₁n₂−c₂n₁)²·n·10⁶ in DECIMAL(38,0) — exact while each arm holds
    //    < ~10⁷ users ((10⁷·10⁷)²·2·10⁷·10⁶ ≈ 10³⁵ < 10³⁸); past ~10⁸
    //    Spark (ANSI off) nulls the overflow where DuckDB HUGEINT errors.
    //    Above that, drop the ppm factor to per-mille — NOT done by
    //    default; the bound is a documented contract, same as q171.
    QueryDef(
      "q179_ab_test",
      (s, d) => {
        val arms = events(s, d)
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase"
              && round(col("value") * 100).cast(LongType) > 20000L, 1L)
            .otherwise(0L)).as("conv"))
          .select(pmod(graft.functions.TextFunctions.hash32(
            concat(lit("ab|"), col("user_id").cast(StringType))), lit(2)).as("arm"),
            col("conv"))
          .groupBy(col("arm"))
          .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
        arms.agg(
            max(when(col("arm") === 0, col("n"))).as("n_a"),
            max(when(col("arm") === 0, col("c"))).as("conv_a"),
            max(when(col("arm") === 1, col("n"))).as("n_b"),
            max(when(col("arm") === 1, col("c"))).as("conv_b"))
          .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
            expr("""CAST((CAST(conv_a*n_b - conv_b*n_a AS DECIMAL(38,0))
                     * (conv_a*n_b - conv_b*n_a) * (n_a + n_b) * 1000000)
                    div (CAST(n_a AS DECIMAL(38,0)) * n_b * (conv_a + conv_b)
                     * (n_a + n_b - conv_a - conv_b)) AS BIGINT)""").as("z2_ppm"))
          .withColumn("significant_95", col("z2_ppm") > 3841459L)
      },
      Some("""WITH u AS (SELECT user_id,
                 max(CASE WHEN event_type = 'purchase'
                   AND CAST(round(value*100) AS BIGINT) > 20000
                   THEN 1 ELSE 0 END)::BIGINT conv
               FROM events GROUP BY 1),
        a AS (SELECT ('0x'||substr(md5('ab|'||user_id::VARCHAR),1,8))::BIGINT % 2 arm,
                count(*)::BIGINT n, sum(conv)::BIGINT c
              FROM u GROUP BY 1),
        w AS (SELECT
                max(CASE WHEN arm = 0 THEN n END) n_a,
                max(CASE WHEN arm = 0 THEN c END) conv_a,
                max(CASE WHEN arm = 1 THEN n END) n_b,
                max(CASE WHEN arm = 1 THEN c END) conv_b
              FROM a)
        SELECT n_a, conv_a, n_b, conv_b,
          CAST(((conv_a*n_b - conv_b*n_a)::HUGEINT * (conv_a*n_b - conv_b*n_a)
                * (n_a + n_b) * 1000000)
               // (n_a::HUGEINT * n_b * (conv_a + conv_b)
                * (n_a + n_b - conv_a - conv_b)) AS BIGINT) z2_ppm,
          CAST(((conv_a*n_b - conv_b*n_a)::HUGEINT * (conv_a*n_b - conv_b*n_a)
                * (n_a + n_b) * 1000000)
               // (n_a::HUGEINT * n_b * (conv_a + conv_b)
                * (n_a + n_b - conv_a - conv_b)) AS BIGINT) > 3841459 AS significant_95
        FROM w""")
    ),

    // ── Mann–Whitney U between the click and purchase value
    //    distributions — the nonparametric "are these the same
    //    distribution" test beside q130's KS (U is power against location
    //    shift, KS against any shape change). EXACT via the doubled-rank
    //    trick (q163's discipline): per distinct cent value with tie
    //    group size f = f₁+f₂ starting after cumBefore elements, every
    //    member's DOUBLED midrank is 2·cumBefore + f + 1 — integers, no
    //    half-rank floats. R1d = Σ f₁·(2·cum + f + 1),
    //    Ud = R1d − 2·(n₁(n₁+1)/2); effect size (common-language
    //    P(X>Y) + ½P(X=Y)) in ppm = Ud·10⁶ div (2·n₁·n₂). The histogram
    //    (cents → f₁, f₂) is dimension-sized; the cumulative runs over
    //    it, never the corpus (q134's shape).
    QueryDef(
      "q180_mannwhitney",
      (s, d) => {
        val h = events(s, d)
          .where(col("event_type").isin("click", "purchase"))
          .select(cents(col("value")).as("v"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("is1"))
          .groupBy(col("v"))
          .agg(sum(col("is1")).as("f1"), sum(lit(1L) - col("is1")).as("f2"))
        val wcum = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
        h.withColumn("cum", coalesce(sum(col("f1") + col("f2")).over(wcum), lit(0L)))
          .agg(sum(col("f1")).as("n1"), sum(col("f2")).as("n2"),
            sum(expr("CAST(f1 AS DECIMAL(38,0)) * (2*cum + f1 + f2 + 1)")).as("r1d"))
          .select(col("n1"), col("n2"),
            expr("CAST(r1d - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS BIGINT)").as("u_doubled"),
            expr("""CAST((r1d - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)) * 1000000
                    div (CAST(2 AS DECIMAL(38,0)) * n1 * n2) AS BIGINT)""").as("effect_ppm"))
      },
      Some("""WITH p AS (SELECT CAST(round(value*100) AS BIGINT) v,
                 CASE WHEN event_type = 'click' THEN 1 ELSE 0 END is1
               FROM events WHERE event_type IN ('click', 'purchase')),
        h AS (SELECT v, sum(is1)::BIGINT f1, sum(1 - is1)::BIGINT f2
              FROM p GROUP BY 1),
        c AS (SELECT v, f1, f2,
                coalesce(sum(f1 + f2) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum
              FROM h),
        a AS (SELECT sum(f1)::HUGEINT n1, sum(f2)::HUGEINT n2,
                sum(f1::HUGEINT * (2*cum + f1 + f2 + 1))::HUGEINT r1d
              FROM c)
        SELECT CAST(n1 AS BIGINT) n1, CAST(n2 AS BIGINT) n2,
          CAST(r1d - n1 * (n1 + 1) AS BIGINT) u_doubled,
          CAST((r1d - n1 * (n1 + 1)) * 1000000 // (2 * n1 * n2) AS BIGINT) effect_ppm
        FROM a""")
    )
  )
}
