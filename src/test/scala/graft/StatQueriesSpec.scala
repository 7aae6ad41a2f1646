package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Semantics of the round-5 drift/robust-stats tranche (q130-q137):
  * brute-force recomputation of each statistic on small real data plus
  * crafted corpora for the algebraic edge cases, and plan-shape audits on
  * the scale-critical paths.
  */
class StatQueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)
  private val sf = "/root/testdata/sf0.001"

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-stats").toString
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q130: KS statistic equals the brute-force max CDF gap") {
    val Seq((na, nb, dppm)) =
      q("q130_ks_drift")(spark, sf).as[(Long, Long, Long)].collect().toSeq
    val ev = queries.Tables.load(spark, sf, "events")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .as[(String, Long)].collect()
    val a = ev.filter(_._1 == "click").map(_._2).sorted
    val b = ev.filter(_._1 == "purchase").map(_._2).sorted
    assert(na === a.length && nb === b.length)
    val grid = (a ++ b).distinct.sorted
    val want = grid.map { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      math.abs(ca * b.length - cb * a.length) * 1000000L / (a.length.toLong * b.length)
    }.max
    assert(dppm === want)
    assert(dppm >= 0 && dppm <= 1000000)
  }

  test("q131: TVD matches brute-force over the union vocabulary; bounds hold") {
    val rows = q("q131_tvd_drift")(spark, sf).as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s1, s2, tv) =>
      assert(s1 < s2); assert(tv >= 0 && tv <= 1000000)
    }
    // brute-force one pair over the FULL union vocab (the query never
    // materializes one-sided words; the algebra must still account them)
    val (p1, p2) = (rows.head._1, rows.head._2)
    val toks = queries.Tables.load(spark, sf, "documents")
      .where(col("source").isin(p1, p2))
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .as[(String, String)].collect()
    val c1 = toks.filter(_._1 == p1).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val c2 = toks.filter(_._1 == p2).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val (n1, n2) = (c1.values.sum, c2.values.sum)
    val num = (c1.keySet ++ c2.keySet).toSeq
      .map(w => (BigInt(c1.getOrElse(w, 0L)) * n2 - BigInt(c2.getOrElse(w, 0L)) * n1).abs)
      .sum
    val want = (num * 1000000 / (BigInt(2) * n1 * n2)).toLong
    assert(rows.head._3 === want)
  }

  test("q132: TTR/hapax on a crafted corpus") {
    val dir = docsDir(Seq(
      (1L, "a a b", "en", "s1"), // tokens=3 types=2 hapax=1 (b)
      (2L, "x y z x", "en", "s2") // tokens=4 types=3 hapax=2 (y,z)
    ))
    val got = q("q132_lexical_diversity")(spark, dir)
      .orderBy("source").as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got === Array(
      ("s1", 3L, 2L, 1L, 2L * 1000000 / 3, 1000000L / 2),
      ("s2", 4L, 3L, 2L, 3L * 1000000 / 4, 2L * 1000000 / 3)))
  }

  test("q133: Benford digits cover 1-9, observed mass sums to ~1e6") {
    val rows = q("q133_benford")(spark, sf).as[(Int, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted === (1 to 9).toArray)
    val mass = rows.map(_._3).sum
    assert(mass > 1000000 - 9 && mass <= 1000000, s"floor-division mass was $mass")
    rows.foreach { case (_, _, obs, exp, dev) => assert(dev === math.abs(obs - exp)) }
    // first digit of the smallest/largest legal price is never 0
    assert(!rows.exists(_._1 == 0))
  }

  test("q134: winsorized mean sits inside [lo, hi]; thresholds are ceil-rank exact") {
    val rows = q("q134_winsorized_mean")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val byType = queries.Tables.load(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .as[(String, Long)].collect().groupBy(_._1)
    rows.foreach { case (t, n, lo, hi, wmean) =>
      val vs = byType(t).map(_._2).sorted
      assert(n === vs.length)
      assert(lo === vs((vs.length + 9) / 10 - 1), "p10 = ceil(N/10)-th order stat")
      assert(hi === vs((9 * vs.length + 9) / 10 - 1), "p90 = ceil(9N/10)-th order stat")
      val want = vs.map(v => math.max(lo, math.min(hi, v))).sum / vs.length
      assert(wmean === want)
      assert(lo <= wmean && wmean <= hi)
    }
  }

  test("q135: apportionment sums exactly to the budget, off-by-at-most-one") {
    val rows = q("q135_apportion")(spark, sf).as[(String, Long, Long)].collect()
    assert(rows.map(_._3).sum === 10000L)
    val nt = rows.map(_._2).sum
    rows.foreach { case (_, n, alloc) =>
      val fl = 10000L * n / nt
      assert(alloc === fl || alloc === fl + 1, s"alloc $alloc vs floor $fl")
    }
  }

  test("q135: deterministic remainder tie-break on a crafted tie") {
    // 3 sources, 2 docs each: floor(10000*2/6)=3333 rem 2 for all three;
    // leftover 10000-9999=1: goes to the lexicographically FIRST source
    val dir = docsDir(Seq(
      (1L, "a", "en", "s1"), (2L, "a", "en", "s1"),
      (3L, "a", "en", "s2"), (4L, "a", "en", "s2"),
      (5L, "a", "en", "s3"), (6L, "a", "en", "s3")))
    val got = q("q135_apportion")(spark, dir)
      .orderBy("source").as[(String, Long, Long)].collect()
    assert(got.map(_._3).toSeq === Seq(3334L, 3333L, 3333L))
  }

  test("q136: novelty counts grams appearing in exactly one source") {
    // "p q r" 3-gram shared by s1,s2; each has one private 3-gram
    val dir = docsDir(Seq(
      (1L, "p q r s", "en", "s1"), // grams: pqr, qrs
      (2L, "o p q r", "en", "s2") // grams: opq, pqr
    ))
    val got = q("q136_ngram_novelty")(spark, dir)
      .orderBy("source").as[(String, Long, Long, Long)].collect()
    assert(got === Array(
      ("s1", 2L, 1L, 500000L),
      ("s2", 2L, 1L, 500000L)))
  }

  test("q137: rolling median equals brute-force over each 5-row frame") {
    val rows = q("q137_rolling_median")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val ev = queries.Tables.load(spark, sf, "events")
      .where(col("user_id") < 30)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("c"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
    val med = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ordered = es.toSeq.sortBy(e => (e._2.getTime, e._3))
      ordered.zipWithIndex.map { case (e, i) =>
        val frame = ordered.slice(math.max(0, i - 4), i + 1).map(_._4).sorted
        e._3 -> frame((frame.length + 1) / 2 - 1)
      }
    }.toMap
    rows.foreach { case (eid, _, _, m) => assert(m === med(eid), s"event $eid") }
  }

  test("plan audit: the drift family stays equi-join + hash-agg at scale") {
    for (name <- Seq("q131_tvd_drift", "q136_ngram_novelty")) {
      val p = q(name)(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name went quadratic\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name nested-loop\n$p")
    }
    // single-scalar broadcasts (totals) are the only BNLJ allowed here
    for (name <- Seq("q130_ks_drift", "q133_benford", "q135_apportion")) {
      val p = q(name)(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name went quadratic\n$p")
    }
    spark.catalog.clearCache()
  }

  test("q162: deciles are exact ceil-rank order statistics per population") {
    val rows = q("q162_qq_table")(spark, sf)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 9))
    val ev = queries.Tables.load(spark, sf, "events")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect()
    def decile(tpe: String, k: Int): Long = {
      val vs = ev.filter(_._1 == tpe).map(_._2).sorted
      vs((vs.length * k + 9) / 10 - 1)
    }
    rows.foreach { case (k, c, p, gap) =>
      assert(c === decile("click", k))
      assert(p === decile("purchase", k))
      assert(gap === p - c)
    }
    spark.catalog.clearCache()
  }

  test("q163: Gini equals the brute-force sorted-rank formula; bounds hold") {
    val rows = q("q163_gini")(spark, sf).as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    val ev = queries.Tables.load(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect()
    rows.foreach { case (t, n, gini) =>
      val xs = ev.filter(_._1 == t).map(_._2).sorted
      assert(n === xs.length)
      val sx = xs.map(BigInt(_)).sum
      val srx = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val want = ((srx * 2 - (BigInt(xs.length) + 1) * sx) * 1000000 /
        (BigInt(xs.length) * sx)).toLong
      assert(gini === want, s"type $t")
      assert(gini >= 0 && gini < 1000000)
    }
  }

  test("q164: top-percentile shares equal the brute-force sorted cut") {
    val rows = q("q164_top_share")(spark, sf)
      .as[(String, Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val ev = queries.Tables.load(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect()
    rows.foreach { case (t, pct, n, nTop, share) =>
      val xs = ev.filter(_._1 == t).map(_._2).sortBy(-_)
      assert(n === xs.length)
      val k = (xs.length.toLong * pct + 99) / 100
      assert(nTop === k)
      val num = xs.take(k.toInt).map(BigInt(_)).sum
      val want = (num * 1000000 / xs.map(BigInt(_)).sum).toLong
      assert(share === want, s"$t p$pct")
    }
    // monotone: bigger slice, bigger share
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byPct = rs.sortBy(_._2).map(_._5)
      byPct.zip(byPct.tail).foreach { case (a, b) => assert(a <= b) }
    }
    spark.catalog.clearCache()
  }
}
