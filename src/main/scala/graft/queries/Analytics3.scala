package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third analytics tranche: bag-semantics set operations, date-part
  * extraction, null-safe equality joins, and the string-function surface —
  * the remaining scalar/operator corners of a complete relational engine.
  */
object Analytics3 {

  private def ord(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "orders")
  private def ev(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "events")
  private def docs(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "documents")

  val defs: Seq[QueryDef] = Seq(

    // ── Bag-semantics set ops: UNION ALL / INTERSECT ALL / EXCEPT ALL
    //    (multiplicity-preserving — distinct ops are q17).
    QueryDef(
      "q37_set_ops_all",
      (s, d) => {
        val o = ord(s, d)
        val hi = o.where(col("o_totalprice") > 100000.0).select(col("o_custkey"))
        val urgent = o.where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        val lo = o.where(col("o_totalprice") < 50000.0).select(col("o_custkey"))
        hi.intersectAll(urgent).exceptAll(lo)
      },
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_totalprice < 50000.0""")
    ),

    // ── Date-part extraction over the order-date dimension (year/quarter/
    //    month/day/last_day) with a per-(year, quarter) rollup.
    QueryDef(
      "q38_date_parts",
      (s, d) =>
        ord(s, d)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast(LongType).as("y"),
            quarter(col("o_orderdate")).cast(LongType).as("q"),
            month(col("o_orderdate")).cast(LongType).as("m"),
            dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
            last_day(col("o_orderdate")).as("month_end")
          ),
      Some("""SELECT o_orderkey,
          year(o_orderdate)::BIGINT AS y,
          quarter(o_orderdate)::BIGINT AS q,
          month(o_orderdate)::BIGINT AS m,
          day(o_orderdate)::BIGINT AS dom,
          last_day(o_orderdate) AS month_end
        FROM orders""")
    ),

    // ── Null-safe equality (<=>): group events by a NULLABLE extracted key
    //    and self-join on it null-safely — nulls match nulls, the semantics
    //    plain equality silently drops.
    QueryDef(
      "q39_null_safe_join",
      (s, d) => {
        val e = ev(s, d).select(
          col("event_id"),
          get_json_object(col("props"), "$.missing_key").as("nk")
        )
        val grp = e.groupBy(col("nk")).agg(count(lit(1)).as("n"))
        e.join(grp, e("nk") <=> grp("nk"))
          .select(col("event_id"), col("n"))
      },
      Some("""WITH e AS (SELECT event_id, json_extract_string(props, '$.missing_key') nk FROM events),
        grp AS (SELECT nk, count(*) n FROM e GROUP BY nk)
        SELECT event_id, n FROM e JOIN grp ON e.nk IS NOT DISTINCT FROM grp.nk""")
    ),

    // ── String-function surface: case mapping, substring, replace,
    //    concat, edit distance — deterministic integer/string outputs.
    QueryDef(
      "q47_string_funcs",
      (s, d) =>
        docs(s, d).select(
          col("doc_id"),
          upper(substring(col("text"), 1, 12)).as("head_upper"),
          regexp_replace(col("text"), "the ", "").as("no_articles"),
          concat_ws("|", col("source"), col("lang")).as("tagged"),
          levenshtein(col("source"), col("lang")).cast(LongType).as("lev"),
          reverse(col("lang")).as("rlang"),
          lpad(col("lang"), 5, "_").as("padded")
        ),
      Some("""SELECT doc_id,
          upper(substr(text, 1, 12)) AS head_upper,
          replace(text, 'the ', '') AS no_articles,
          concat_ws('|', source, lang) AS tagged,
          levenshtein(source, lang)::BIGINT AS lev,
          reverse(lang) AS rlang,
          lpad(lang, 5, '_') AS padded
        FROM documents""")
    )
  )
}
