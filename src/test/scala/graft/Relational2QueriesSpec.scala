package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-5 relational tranche (q143-q145): IVM merge
  * equivalence, the Q5 local-supplier wrinkle, and fuzzy-join blocking.
  */
class Relational2QueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)
  private val sf = "/root/testdata/sf0.001"

  test("q143: merged view is identical to the full recompute on every row") {
    val rows = q("q143_ivm_merge")(spark, sf)
      .as[(String, String, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._5), "every merged row must match the full recompute")
    // base+delta carve is a partition: totals equal the raw corpus
    val n = queries.Tables.load(spark, sf, "events").count()
    assert(rows.map(_._3).sum === n)
  }

  test("q144: local-supplier constraint prunes cross-nation pairs") {
    val got = q("q144_local_supplier_volume")(spark, sf)
      .as[(String, Long)].collect()
    // revenue sorted desc by construction
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
    // recompute one nation's revenue brute-force WITH the s_nationkey =
    // c_nationkey constraint; dropping the constraint must give >= value
    def t(n: String) = queries.Tables.load(spark, sf, n)
    val joined = t("region").where(col("r_name") === "ASIA")
      .join(t("nation"), col("n_regionkey") === col("r_regionkey"))
      .join(t("customer"), col("c_nationkey") === col("n_nationkey"))
      .join(t("orders"), col("o_custkey") === col("c_custkey"))
      .where(col("o_orderdate") >= "1997-01-01" && col("o_orderdate") < "1998-01-01")
      .join(t("lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
    val withConstraint = joined.where(col("s_nationkey") === col("c_nationkey"))
      .select(col("n_name"),
        (round(col("l_extendedprice") * 100).cast("decimal(38,0)")
          * (lit(100) - round(col("l_discount") * 100).cast("decimal(38,0)"))).as("r"))
      .groupBy("n_name").agg(sum("r").cast("long").as("rev"))
      .as[(String, Long)].collect().toMap
    got.foreach { case (nation, rev) => assert(rev === withConstraint(nation)) }
    val without = joined
      .select((round(col("l_extendedprice") * 100).cast("decimal(38,0)")
        * (lit(100) - round(col("l_discount") * 100).cast("decimal(38,0)"))).as("r"))
      .agg(sum("r").cast("long")).as[Long].head()
    assert(without >= got.map(_._2).sum, "constraint must prune, not invent, revenue")
  }

  test("q144: plan broadcasts the dims and keeps orders-lineitem the only big join") {
    val p = q("q144_local_supplier_volume")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q145: every reported pair shares a noun block and respects the distance cap") {
    val rows = q("q145_fuzzy_join")(spark, sf)
      .as[(String, String, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, dist, na, nb) =>
      assert(a < b)
      assert(a.split(" ").last === b.split(" ").last, "blocking key must match")
      assert(dist >= 1 && dist <= 2)
      // exact Levenshtein recomputation
      def lev(x: String, y: String): Int = {
        val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to x.length; j <- 1 to y.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
        d(x.length)(y.length)
      }
      assert(dist === lev(a, b))
      assert(na >= 1 && nb >= 1)
    }
    // the known dictionary structure: cold->old at distance 1 present
    assert(rows.exists(r => r._1.startsWith("cold ") && r._2.startsWith("old ") && r._3 == 1))
  }
}
