package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Semantics of the round-5 governance/graph tranche (q138-q142): crafted
  * corpora with hand-computed expectations, invariants on real data, and
  * plan audits for the scale-critical joins.
  */
class Pipeline3QueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)
  private val sf = "/root/testdata/sf0.001"

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-p3").toString
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q138: classes below k=5 are flagged, risk mass adds up") {
    // lang en: 6 docs in one class (safe) + 2 docs in another (at risk)
    val dir = docsDir(
      (1L to 6L).map(i => (i, "x" * 50, "en", "sA")) ++
        Seq((7L, "y" * 250, "en", "sA"), (8L, "y" * 251, "en", "sA")))
    val got = q("q138_kanonymity")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got === Array(("en", 2L, 1L, 8L, 2L, 250000L)))
  }

  test("q139: diff statuses partition both versions; counts match the carve rule") {
    val rows = q("q139_snapshot_diff")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val ids = queries.Tables.load(spark, sf, "documents")
      .select(col("doc_id")).as[Long].collect()
    val added = ids.count(id => id % 17 == 0 && id % 11 != 0)
    val removed = ids.count(id => id % 17 != 0 && id % 11 == 0)
    val changed = ids.count(id => id % 17 != 0 && id % 11 != 0 && id % 13 == 0)
    val unchanged = ids.count(id => id % 17 != 0 && id % 11 != 0 && id % 13 != 0)
    assert(rows.map(_._2).sum === added)
    assert(rows.map(_._3).sum === removed)
    assert(rows.map(_._4).sum === changed)
    assert(rows.map(_._5).sum === unchanged)
  }

  test("q140: purity is exact per community; community label is its min member id") {
    val rows = q("q140_communities")(spark, sf)
      .as[(Long, Long, Int, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (community, sz, _, purity) =>
      assert(sz >= 1)
      assert(purity >= 1000000L / 10 / 2 && purity <= 1000000L,
        s"purity $purity out of plausible range for community $community")
    }
    // communities are identified by their minimum member id, so ids are
    // valid vec_ids of the capped tier
    rows.foreach { case (c, _, _, _) => assert(c >= 0 && c < 500) }
    spark.catalog.clearCache()
  }

  test("q141: sign and r2 equal a brute-force 3-NN + Pearson recomputation") {
    val dir = Files.createTempDirectory("graft-p3e").toString
    val dim = 8
    val vecs = (0 until 9).map { i =>
      val v = Array.tabulate(dim) { j =>
        if (i == 0) 1.0f
        else if (j == i % dim) 1.0f else 0.001f * (i + 1)
      }
      (i.toLong, v.toSeq, i % 3)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val (n, sign, r2) = q("q141_degree_assortativity")(spark, dir)
      .as[(Long, Int, Option[Long])].collect().head
    // brute-force the same chain: exact cosine 3-NN (ties by id), undirected
    // dedup, symmetrized degree pairs, integer Pearson moments
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
      val na = math.sqrt(ad.foldLeft(0.0)((acc, x) => acc + x * x))
      val nb = math.sqrt(bd.foldLeft(0.0)((acc, x) => acc + x * x))
      dot / (na * nb)
    }
    val edges = vecs.flatMap { case (i, vi, _) =>
      vecs.filter(_._1 != i)
        .map { case (j, vj, _) => (j, cos(vi, vj)) }
        .sortBy { case (j, c) => (-c, j) }.take(3)
        .map { case (j, _) => (math.min(i, j), math.max(i, j)) }
    }.distinct
    val und = edges ++ edges.map { case (u, v) => (v, u) }
    val deg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xs = und.map { case (u, v) => (BigInt(deg(u)), BigInt(deg(v))) }
    val bn = BigInt(xs.size)
    val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum; val syy = xs.map(p => p._2 * p._2).sum
    val sxy = xs.map(p => p._1 * p._2).sum
    val num = bn * sxy - sx * sy
    val denx = bn * sxx - sx * sx; val deny = bn * syy - sy * sy
    assert(n === xs.size.toLong)
    assert(sign === num.signum)
    if (denx == 0 || deny == 0) assert(r2.isEmpty)
    else assert(r2.contains((num * num * 1000000 / (denx * deny)).toLong))
    spark.catalog.clearCache()
  }

  test("q142: residuals rank against per-(type,hour) baselines, frame exact") {
    val rows = q("q142_seasonal_residual")(spark, sf)
      .as[(Long, String, Int, Long, Long, Long)].collect()
    assert(rows.length === 15)
    val ev = queries.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), hour(col("ts")).as("hr"),
        round(col("value") * 100).cast("long").as("c"))
      .as[(Long, String, Int, Long)].collect()
    val base = ev.groupBy(e => (e._2, e._3)).view
      .mapValues(es => es.map(_._4).sum / es.length).toMap
    val want = ev.map(e => (e._1, math.abs(e._4 - base((e._2, e._3)))))
      .sortBy(e => (-e._2, e._1)).take(15).map(_._1)
    assert(rows.map(_._1).toSeq === want.toSeq)
    rows.foreach { case (_, t, hr, c, b, r) =>
      assert(b === base((t, hr))); assert(r === math.abs(c - b))
    }
  }

  test("plan audit: governance/diff family is equi-join only") {
    for (name <- Seq("q138_kanonymity", "q139_snapshot_diff", "q142_seasonal_residual")) {
      val p = q(name)(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name went quadratic\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name nested-loop\n$p")
    }
  }
}
