package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 tranche three: incremental view maintenance, the TPC-H Q5
  * multi-way join shape, and blocked fuzzy entity matching — the
  * relational depth operators a warehouse migration checks first.
  */
object Relational2Queries {

  private def events(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "events")

  val defs: Seq[QueryDef] = Seq(

    // ── Incremental view maintenance: the per-(type, day) count/sum view
    //    is maintained as base ⊎ delta — two partial aggregates merged by
    //    ONE full-outer equi-join with coalesced addition — instead of
    //    recomputing over the full corpus. THE operator behind every
    //    incremental sync the reference performs: at 100 TB the delta is
    //    hours of data, the base view is a compact table, and the merge
    //    cost is view-sized, not corpus-sized. The query ALSO recomputes
    //    the view directly and pins equality (matches_full TRUE per row,
    //    oracle-checked) — the IVM correctness contract, not an assertion
    //    in a test somewhere.
    QueryDef(
      "q143_ivm_merge",
      (s, d) => {
        val e = events(s, d).select(col("event_type"),
          to_date(col("ts")).cast(StringType).as("day_str"),
          round(col("value") * 100).cast(LongType).as("c"),
          col("event_id"))
        def view(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("event_type"), col("day_str"))
            .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_cents"))
        val base = view(e.where(expr("event_id % 10 != 0")))
          .withColumnRenamed("n", "bn").withColumnRenamed("sum_cents", "bs")
        val delta = view(e.where(expr("event_id % 10 = 0")))
          .withColumnRenamed("n", "dn").withColumnRenamed("sum_cents", "ds")
        val merged = base.join(delta, Seq("event_type", "day_str"), "full_outer")
          .select(col("event_type"), col("day_str"),
            (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
            (coalesce(col("bs"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("sum_cents"))
        val full = view(e)
          .withColumnRenamed("n", "fn").withColumnRenamed("sum_cents", "fs")
        merged.join(full, Seq("event_type", "day_str"), "full_outer")
          .select(col("event_type"), col("day_str"), col("n"), col("sum_cents"),
            (col("n") === col("fn") && col("sum_cents") === col("fs")).as("matches_full"))
      },
      Some("""WITH e AS (SELECT event_type,
                 CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS VARCHAR) day_str,
                 CAST(round(value*100) AS BIGINT) c, event_id
               FROM events),
        b AS (SELECT event_type, day_str, count(*)::BIGINT bn, sum(c)::BIGINT bs
              FROM e WHERE event_id % 10 != 0 GROUP BY 1, 2),
        dl AS (SELECT event_type, day_str, count(*)::BIGINT dn, sum(c)::BIGINT ds
               FROM e WHERE event_id % 10 = 0 GROUP BY 1, 2),
        m AS (SELECT coalesce(b.event_type, dl.event_type) event_type,
                coalesce(b.day_str, dl.day_str) day_str,
                (coalesce(bn, 0) + coalesce(dn, 0))::BIGINT n,
                (coalesce(bs, 0) + coalesce(ds, 0))::BIGINT sum_cents
              FROM b FULL OUTER JOIN dl USING (event_type, day_str)),
        f AS (SELECT event_type, day_str, count(*)::BIGINT fn, sum(c)::BIGINT fs
              FROM e GROUP BY 1, 2)
        SELECT m.event_type, m.day_str, m.n, m.sum_cents,
          (m.n = f.fn AND m.sum_cents = f.fs) AS matches_full
        FROM m FULL OUTER JOIN f USING (event_type, day_str)""")
    ),

    // ── TPC-H Q5 shape — local supplier volume: the 6-table join with
    //    the signature wrinkle that the supplier must sit in the
    //    customer's own nation (c_nationkey = s_nationkey across the
    //    order). Plan discipline: region/nation broadcast (dims),
    //    orders⋈lineitem is the only big shuffle (both sides keyed by
    //    orderkey), customer and supplier attach by key equi-joins.
    //    Revenue is exact: Σ cents·(100−disc_pct) in DECIMAL(38,0),
    //    reported in 10^-4 dollar units — no float sum crosses engines.
    QueryDef(
      "q144_local_supplier_volume",
      (s, d) => {
        def t(n: String) = Tables.load(s, d, n)
        val dec = DecimalType(38, 0)
        val asia = t("region").where(col("r_name") === "ASIA")
        val nat = t("nation").join(broadcast(asia),
          col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val cust = t("customer").join(broadcast(nat),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
        val ord = t("orders")
          .where(col("o_orderdate") >= "1997-01-01" && col("o_orderdate") < "1998-01-01")
          .select(col("o_orderkey"), col("o_custkey"))
        val li = t("lineitem").select(col("l_orderkey"), col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast(dec)
            * (lit(100) - round(col("l_discount") * 100).cast(dec))).as("rev"))
        val sup = t("supplier").select(col("s_suppkey"), col("s_nationkey"))
        ord.join(cust, col("o_custkey") === col("c_custkey"))
          .join(li, col("l_orderkey") === col("o_orderkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey")
            && col("s_nationkey") === col("c_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("rev")).as("revsum"))
          .select(col("n_name"), col("revsum").cast(LongType).as("revenue_e4"))
          .orderBy(col("revenue_e4").desc, col("n_name").asc)
      },
      Some("""SELECT n_name,
          CAST(sum(CAST(round(l_extendedprice*100) AS HUGEINT)
               * (100 - CAST(round(l_discount*100) AS HUGEINT))) AS BIGINT) AS revenue_e4
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue_e4 DESC, n_name ASC""")
    ),

    // ── Blocked fuzzy entity matching over the part-name dictionary:
    //    candidate pairs share a blocking key (the noun) and pass a
    //    length prefilter BEFORE the edit-distance evaluates — the
    //    standard fuzzy-join ladder (block → cheap filter → exact
    //    verify) that never goes corpus×corpus. Scale posture: the match
    //    runs on the DISTINCT name dictionary (vocabulary-sized, not
    //    corpus-sized); per-name part counts join back afterward, so
    //    100 TB of rows cost one hash aggregate. Levenshtein ≤ 2 is
    //    integer-exact in both engines.
    QueryDef(
      "q145_fuzzy_join",
      (s, d) => {
        val names = Tables.load(s, d, "part")
          .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
          .withColumn("noun", substring_index(col("p_name"), " ", -1))
        val a = names.select(col("p_name").as("name_a"), col("n_parts").as("n_a"),
          col("noun"))
        val b = names.select(col("p_name").as("name_b"), col("n_parts").as("n_b"),
          col("noun"))
        a.join(b, Seq("noun"))
          .where(col("name_a") < col("name_b")
            && abs(length(col("name_a")) - length(col("name_b"))) <= 2
            && levenshtein(col("name_a"), col("name_b")) <= 2)
          .select(col("name_a"), col("name_b"),
            levenshtein(col("name_a"), col("name_b")).as("dist"),
            col("n_a"), col("n_b"))
      },
      Some("""WITH n AS (SELECT p_name, count(*)::BIGINT n_parts,
                 string_split(p_name, ' ')[-1] noun
               FROM part GROUP BY 1)
        SELECT a.p_name name_a, b.p_name name_b,
          levenshtein(a.p_name, b.p_name)::INT dist,
          a.n_parts n_a, b.n_parts n_b
        FROM n a JOIN n b ON a.noun = b.noun AND a.p_name < b.p_name
        WHERE abs(len(a.p_name) - len(b.p_name)) <= 2
          AND levenshtein(a.p_name, b.p_name) <= 2""")
    )
  )
}
