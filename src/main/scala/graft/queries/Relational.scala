package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The relational operator surface, one query per operator class of
  * SURVEY.md §2, expressed over the driver's TPC-H-ish tables.
  *
  * Numeric-aggregate convention: floating-point summation order differs
  * between engines, so every SUM/AVG runs in exact DECIMAL arithmetic and
  * converts to DOUBLE once at the end — bit-identical on Spark and DuckDB.
  */
object Relational {

  private val dec = DecimalType(18, 2)

  private def li(s: SparkSession, d: String) = Tables.load(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables.load(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables.load(s, d, "customer")
  private def ev(s: SparkSession, d: String) = Tables.load(s, d, "events")
  private def nat(s: SparkSession, d: String) = Tables.load(s, d, "nation")
  private def sup(s: SparkSession, d: String) = Tables.load(s, d, "supplier")
  private def reg(s: SparkSession, d: String) = Tables.load(s, d, "region")
  private def prt(s: SparkSession, d: String) = Tables.load(s, d, "part")

  /** sum(decimal) → double, deterministic across engines. */
  private def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(dec)).cast(DoubleType)

  val defs: Seq[QueryDef] = Seq(

    // ── §2.5 aggregation: TPC-H Q1 pricing summary (group-agg with map-side
    //    partial aggregation; the headline agg benchmark).
    QueryDef(
      "q1_agg",
      (s, d) => {
        val l = li(s, d)
        l.filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(col("l_extendedprice").cast(dec) * (lit(BigDecimal(1)).cast(dec) - col("l_discount").cast(dec)))
              .cast(DoubleType).as("sum_disc_price"),
            (sum(col("l_quantity").cast(dec)).cast(DoubleType) / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order")
          )
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' GROUP BY l_returnflag, l_linestatus""")
    ),

    // ── §2.2 projection + filter (pushdown): column-pruned scan with a
    //    range predicate — the `_source.includes` + range analog.
    QueryDef(
      "q2_scan_project",
      (s, d) =>
        li(s, d)
          .filter(col("l_quantity") > 45.0)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_shipdate")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        FROM lineitem WHERE l_quantity > 45.0""")
    ),

    // ── §2.2 equality + half-open time-range predicate — the reference's
    //    per-subject page filter (elastic.go:47-54): match(subject) AND
    //    time ∈ [start, stop).
    QueryDef(
      "q3_filter_eq_range",
      (s, d) =>
        ev(s, d)
          .filter(
            col("event_type") === "purchase" &&
              col("ts") >= lit("2024-01-10 00:00:00") &&
              col("ts") < lit("2024-01-20 00:00:00")
          )
          .select(col("event_id"), col("user_id"), col("ts"), col("value")),
      Some("""WITH ev AS (SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events)
        SELECT event_id, user_id, ts, value FROM ev
        WHERE event_type = 'purchase'
          AND ts >= TIMESTAMP '2024-01-10 00:00:00'
          AND ts < TIMESTAMP '2024-01-20 00:00:00'""")
    ),

    // ── §2.5/§2.1 DISTINCT key discovery — `SELECT DISTINCT token_id FROM
    //    signal` (clickhouse.go:89-110) on the events fact table.
    QueryDef(
      "q4_distinct_keys",
      (s, d) => ev(s, d).select(col("user_id")).distinct(),
      Some("SELECT DISTINCT user_id FROM events")
    ),

    // ── §2.3 top-K by time: ORDER BY time DESC LIMIT n — the ES page query
    //    (elastic.go:58-65). Spark plans TakeOrderedAndProject (no global
    //    sort). event_id tiebreak keeps the row set deterministic.
    QueryDef(
      "q5_topk_desc",
      (s, d) =>
        ev(s, d)
          .orderBy(col("ts").desc, col("event_id").asc)
          .limit(100)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type")),
      Some("""WITH ev AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
        SELECT event_id, user_id, ts, event_type FROM ev
        ORDER BY ts DESC, event_id ASC LIMIT 100""")
    ),

    // ── §2.5/§2.7 per-key low watermark: oldest timestamp per key in ONE
    //    aggregate — replaces the reference's N point queries
    //    (clickhouse.go:65-87).
    QueryDef(
      "q6_watermark_per_key",
      (s, d) =>
        ev(s, d).groupBy(col("user_id")).agg(min(col("ts")).as("watermark")),
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
        SELECT user_id, min(ts) AS watermark FROM ev GROUP BY user_id""")
    ),

    // ── §2.4 broadcast lookup join: fact × small dim — the tokenId⇄subject
    //    identity lookup (deviceapi/service.go:52-105) as a BHJ.
    QueryDef(
      "q7_broadcast_lookup",
      (s, d) =>
        ord(s, d)
          .join(broadcast(cust(s, d)), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_totalprice"), col("c_name"), col("c_mktsegment")),
      Some("""SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey""")
    ),

    // ── §2.4 negative-cache analog: left-anti — keys with no match
    //    (deviceapi/service.go:62-70 NotFound caching).
    QueryDef(
      "q8_anti_join",
      (s, d) =>
        cust(s, d)
          .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name")),
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""")
    ),

    // ── §2.4 semi-join scope reduction — only keys present in the sink get
    //    synced (sync.go:213-216).
    QueryDef(
      "q9_semi_join",
      (s, d) =>
        ord(s, d)
          .join(
            cust(s, d).filter(col("c_mktsegment") === "BUILDING"),
            col("o_custkey") === col("c_custkey"),
            "left_semi"
          )
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""")
    ),

    // ── §2.8 JSON scalar extraction — gjson.GetBytes (sync.go:195,200) as a
    //    codegen'd get_json_object over the events props column.
    QueryDef(
      "q10_json_get",
      (s, d) =>
        ev(s, d)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast(LongType).as("k")
          ),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events""")
    ),

    // ── §2.6 document→rows conversion (the core operator): each event
    //    explodes into EAV signal rows with dual-typed value columns —
    //    numeric signals fill value_number (value_string=''), string
    //    signals the reverse, exactly the vss.Signal layout
    //    (sync.go:187-208).
    QueryDef(
      "q11_signal_explode",
      (s, d) => {
        val e = ev(s, d)
        val sigs = array(
          struct(
            lit("Event.Value").as("name"),
            col("value").as("value_number"),
            lit("").as("value_string")
          ),
          struct(
            lit("Event.PropsK").as("name"),
            get_json_object(col("props"), "$.k").cast(DoubleType).as("value_number"),
            lit("").as("value_string")
          ),
          struct(
            lit("Event.Type").as("name"),
            lit(0.0).as("value_number"),
            col("event_type").as("value_string")
          )
        )
        e.select(col("event_id"), col("user_id"), col("ts").as("timestamp"), explode(sigs).as("sig"))
          .select(
            col("event_id"),
            col("user_id"),
            col("timestamp"),
            col("sig.name").as("name"),
            col("sig.value_number").as("value_number"),
            col("sig.value_string").as("value_string")
          )
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type, value, props, CAST(ts AS TIMESTAMP) AS ts FROM events)
        SELECT event_id, user_id, ts AS timestamp, 'Event.Value' AS name, value AS value_number, '' AS value_string FROM ev
        UNION ALL
        SELECT event_id, user_id, ts, 'Event.PropsK', CAST(json_extract_string(props, '$.k') AS DOUBLE), '' FROM ev
        UNION ALL
        SELECT event_id, user_id, ts, 'Event.Type', 0.0, event_type FROM ev""")
    ),

    // ── §2.6 versioned-payload dispatch (sync.go:187-208): each document
    //    is converted by the definition table its version selects — here
    //    the production operator runs over `events` with 'purchase' rows
    //    dispatched to a v2 table (scaled percent) and everything else to
    //    v1. One Column program, no per-row error path; the oracle replays
    //    the dispatch as a CASE-guarded UNION ALL.
    QueryDef(
      "q59_versioned_dispatch",
      (s, d) => {
        import graft.schema.{SignalDefinition, ValueKind}
        val docs = ev(s, d).select(
          col("user_id").cast(StringType).as("subject"),
          col("event_type").as("source"),
          col("ts").as("time"),
          col("props").as("data")
        )
        graft.ops.SignalExplode.explodeSignalsVersioned(
          docs,
          byVersion = Map(
            "1" -> Seq(SignalDefinition("Event.K", "k", ValueKind.Number)),
            "2" -> Seq(SignalDefinition("Event.K.Percent", "k", ValueKind.Number, 100.0))
          ),
          version = Some(when(col("source") === "purchase", lit("2")).otherwise(lit("1")))
        )
      },
      Some("""WITH ev AS (SELECT CAST(user_id AS VARCHAR) subject, event_type source,
          CAST(ts AS TIMESTAMP) ts, props FROM events)
        SELECT subject, ts AS timestamp, 'Event.K' AS name,
          CAST(json_extract_string(props, '$.k') AS DOUBLE) AS valueNumber,
          '' AS valueString, source
        FROM ev WHERE source <> 'purchase' AND json_extract_string(props, '$.k') IS NOT NULL
        UNION ALL
        SELECT subject, ts, 'Event.K.Percent',
          CAST(json_extract_string(props, '$.k') AS DOUBLE) * 100.0, '', source
        FROM ev WHERE source = 'purchase' AND json_extract_string(props, '$.k') IS NOT NULL""")
    ),

    // ── §2.7 incremental resume: watermark join + bounded filter — new
    //    rows are those strictly before each key's sink watermark
    //    (sync.go:128-137), fresh keys keep the full range.
    QueryDef(
      "q12_incremental_resume",
      (s, d) => {
        val e = ev(s, d)
        // Simulated sink state: the half of events already synced (even ids).
        val sink = e.filter(col("event_id") % 2 === 0)
        val wm = sink.groupBy(col("user_id")).agg(min(col("ts")).as("watermark"))
        e.join(broadcast(wm), Seq("user_id"), "left_outer")
          .where(col("watermark").isNull || col("ts") < col("watermark"))
          .select(col("event_id"), col("user_id"), col("ts"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        wm AS (
          SELECT user_id, min(ts) AS watermark FROM ev WHERE event_id % 2 = 0 GROUP BY user_id
        )
        SELECT event_id, e.user_id, ts FROM ev e LEFT JOIN wm ON e.user_id = wm.user_id
        WHERE wm.watermark IS NULL OR e.ts < wm.watermark""")
    ),

    // ── Multi-way join with dim-chain broadcast (TPC-H Q5 shape): revenue
    //    per nation — exercises join ordering + broadcast of the dim chain.
    QueryDef(
      "q13_join_agg",
      (s, d) => {
        val revenue = col("l_extendedprice").cast(dec) *
          (lit(BigDecimal(1)).cast(dec) - col("l_discount").cast(dec))
        li(s, d)
          .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(cust(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(revenue).cast(DoubleType).as("revenue"), count(lit(1)).as("n_items"))
      },
      Some("""SELECT r_name, n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name""")
    ),

    // ── §2.2 disjunctive EXISTS pushdown analog (elastic.go:72-78): keep
    //    rows where ≥1 requested attribute is present/matching.
    QueryDef(
      "q14_exists_filter",
      (s, d) => {
        // One JSON parse per row: both probed attributes come out of a
        // single from_json (two get_json_object calls parse the document
        // twice — measured 2x on the full scan).
        val probed = from_json(col("props"), StructType(Seq(
          StructField("k", StringType), StructField("missing", StringType))))
        ev(s, d)
          .withColumn("_p", probed)
          .filter(col("_p.k").isNotNull || col("_p.missing").isNotNull)
          .select(col("event_id"), col("event_type"))
      },
      Some("""SELECT event_id, event_type FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
           OR json_extract_string(props, '$.missing') IS NOT NULL""")
    )
  )
}
