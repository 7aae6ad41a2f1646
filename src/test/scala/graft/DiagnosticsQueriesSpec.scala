package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Semantics of the round-5 sampling/diagnostics tranche (q146-q150):
  * exact-budget PPS invariants, skew-panel arithmetic, orphan detection
  * on a corrupted child table, TWAP against brute force, and quantile
  * monotonicity.
  */
class DiagnosticsQueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)
  private val sf = "/root/testdata/sf0.001"

  test("q146: systematic PPS selects exactly the budget, hits track weight share") {
    val rows = q("q146_pps_sample")(spark, sf).as[(Long, Long, Long)].collect()
    assert(rows.map(_._3).sum === 20L, "total hits must equal the budget k")
    // a doc can only multi-hit if its weight exceeds one stride
    val wt = queries.Tables.load(spark, sf, "documents")
      .agg(sum("n_chars")).as[Long].head()
    val stride = wt / 20
    rows.filter(_._3 > 1).foreach { case (id, w, h) =>
      assert(w > stride * (h - 1), s"doc $id got $h hits with weight $w < ${stride * (h - 1)}")
    }
    // deterministic: rerunning gives the identical sample
    val again = q("q146_pps_sample")(spark, sf).as[(Long, Long, Long)].collect()
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("q147: bucket panel partitions keys; selfjoin_rows >= n_rows in each bucket") {
    val rows = q("q147_join_skew")(spark, sf).as[(Int, Long, Long, Long)].collect()
    val fans = queries.Tables.load(spark, sf, "lineitem")
      .groupBy("l_suppkey").count().as[(Long, Long)].collect()
    assert(rows.map(_._2).sum === fans.length)
    assert(rows.map(_._3).sum === fans.map(_._2).sum)
    rows.foreach { case (bkt, _, nRows, sj) =>
      assert(sj >= nRows)
      assert(bkt >= 1)
    }
    // brute-force one bucket
    val byBucket = fans.groupBy(f => java.lang.Long.toBinaryString(f._2).length)
    rows.foreach { case (bkt, nk, nr, sj) =>
      val fs = byBucket(bkt)
      assert(nk === fs.length && nr === fs.map(_._2).sum)
      assert(sj === fs.map(f => f._2 * f._2).sum)
    }
  }

  test("q148: clean schema has zero orphans; corrupting the parent surfaces them") {
    val clean = q("q148_ref_integrity")(spark, sf).as[(String, Long, Long, Long)].collect()
    assert(clean.length === 4)
    clean.foreach { case (fk, n, orphans, ppm) =>
      assert(orphans === 0L && ppm === 0L, s"$fk unexpectedly dirty")
      assert(n > 0)
    }
    // carve a corrupted copy: drop half the suppliers
    val dir = Files.createTempDirectory("graft-ri").toString
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier")) {
      val df = queries.Tables.load(spark, sf, t)
      val out = if (t == "supplier") df.where(expr("s_suppkey % 2 = 0")) else df
      out.write.parquet(s"$dir/$t.parquet")
    }
    val dirty = q("q148_ref_integrity")(spark, dir).as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(dirty("lineitem.suppkey")._3 > 0, "dropped suppliers must orphan lineitems")
    assert(dirty("lineitem.orderkey")._3 === 0)
  }

  test("q149: TWAP equals the brute-force trapezoid-free integral per user") {
    val rows = q("q149_twap")(spark, sf).as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val ev = queries.Tables.load(spark, sf, "events")
      .where(col("user_id") < 50)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 100).cast("long").as("c"))
      .as[(Long, Long, Long, Long)].collect()
    val want = ev.groupBy(_._1).view.mapValues { es =>
      val ord = es.sortBy(e => (e._2, e._3))
      val segs = ord.zip(ord.tail).map { case (a, b) => (BigInt(b._2 - a._2), BigInt(a._4)) }
      val num = segs.map(s => s._1 * s._2).sum
      val den = segs.map(_._1).sum
      (segs.length.toLong, (num / den).toLong)
    }.toMap
    rows.foreach { case (u, n, twap) =>
      assert((n, twap) === want(u), s"user $u")
    }
  }

  test("q150: percentile rank is monotone in value, 0 at min and 1e6 at max") {
    val rows = q("q150_quantile_norm")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val sorted = rows.sortBy(_._3)
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      assert(a._4 <= b._4, "pct must be monotone in cents")
      if (a._3 == b._3) assert(a._4 === b._4, "equal values share a rank")
    }
    // global extremes: a panel row holding the corpus min maps to 0 ppm
    val allCents = queries.Tables.load(spark, sf, "events")
      .select(round(col("value") * 100).cast("long")).as[Long].collect()
    if (sorted.head._3 == allCents.min) assert(sorted.head._4 === 0L)
    rows.foreach { case (_, _, _, p) => assert(p >= 0 && p <= 1000000) }
  }

  test("q159: all 21 pairs present; r2 agrees with Spark's corr to 1e-6") {
    val rows = q("q159_corr_matrix")(spark, sf)
      .as[(String, String, Int, Option[Double])].collect()
    assert(rows.length === 21)
    val li = queries.Tables.load(spark, sf, "lineitem")
    rows.foreach { case (a, b, sign, r2) =>
      val r = li.select(corr(round(col(a) * 100), round(col(b) * 100))).as[Double].head()
      assert(r2.isDefined)
      assert(math.abs(r * r * 1e6 - r2.get) < 1.0, s"$a/$b: ${r * r * 1e6} vs ${r2.get}")
      assert(sign === math.signum(r).toInt || r == 0.0)
    }
  }
}
