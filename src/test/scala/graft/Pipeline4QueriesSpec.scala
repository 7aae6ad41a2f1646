package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Semantics of the round-5 vocabulary/audit tranche (q151-q153). */
class Pipeline4QueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)
  private val sf = "/root/testdata/sf0.001"

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-p4").toString
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q151: coverage curve bands on a crafted Zipf corpus") {
    // word frequencies: a=8, b=3, c=1 -> bands 4 (8..15), 2 (2..3), 1 (1)
    val dir = docsDir(Seq(
      (1L, "a a a a a a a a", "en", "s"),
      (2L, "b b b c", "en", "s")))
    val got = q("q151_zipf_coverage")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // thresholds 1, 2, 8
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 8L))
    assert(got(0) === ((1L, 3L, 12L, 1000000L))) // t=1: all 3 types, all 12 tokens
    assert(got(1) === ((2L, 2L, 11L, 11L * 1000000 / 12)))
    assert(got(2) === ((8L, 1L, 8L, 8L * 1000000 / 12)))
  }

  test("q151: curve is monotone (higher threshold, less vocab, less coverage)") {
    val got = q("q151_zipf_coverage")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    got.zip(got.tail).foreach { case (a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3 && a._4 >= b._4)
    }
    assert(got.head._4 === 1000000L, "threshold 1 must cover everything")
  }

  test("q152: bucket stats are exact; deviation matches brute force") {
    val Seq((nb, nd, mn, mx, dev)) =
      q("q152_hash_uniformity")(spark, sf).as[(Long, Long, Long, Long, Long)].collect().toSeq
    val counts = queries.Tables.load(spark, sf, "documents")
      .select(pmod(graft.functions.TextFunctions.hash32(
        concat(lit("q103|"), col("doc_id").cast("string"))), lit(100)).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().map(_._2)
    assert(nb === counts.length)
    assert(nd === counts.sum && mn === counts.min && mx === counts.max)
    assert(dev === counts.map(n => math.abs(n * 100 - counts.sum) * 1000000L / (100 * counts.sum)).max)
  }

  test("q153: centroid distances are symmetric-complete and match brute force for one pair") {
    val rows = q("q153_centroid_matrix")(spark, sf)
      .as[(Int, Int, Long)].collect()
    val labels = queries.Tables.load(spark, sf, "embeddings")
      .select("label").distinct().as[Int].collect().sorted
    assert(rows.length === labels.length * (labels.length - 1) / 2)
    // brute-force the (labels(0), labels(1)) pair
    val vecs = queries.Tables.load(spark, sf, "embeddings")
      .select(col("label"), col("embedding")).as[(Int, Seq[Float])].collect()
    def centroid(l: Int): Array[Long] = {
      val vs = vecs.filter(_._1 == l).map(_._2)
      val dims = vs.head.length
      Array.tabulate(dims) { j =>
        val qs = vs.map(v => math.floor(v(j).toDouble * 1048576 + 0.5).toLong)
        val cnt = qs.length
        (qs.sum + cnt * 2097152L) / cnt - 2097152L
      }
    }
    val (l1, l2) = (labels(0), labels(1))
    val (c1, c2) = (centroid(l1), centroid(l2))
    val want = c1.zip(c2).map { case (a, b) => (a - b) * (a - b) }.sum
    val got = rows.find(r => r._1 == l1 && r._2 == l2).get._3
    assert(got === want)
  }

  test("q160: merged registers equal direct registers on a wide crafted vocab") {
    // 2000 distinct tokens spread over 4 sources fills most registers
    val dir = docsDir((1L to 40L).map { i =>
      val words = ((i - 1) * 50 until i * 50).map(j => s"tok$j").mkString(" ")
      (i, words, "en", s"s${i % 4}")
    })
    val Seq((eq, nReg, checksum)) = q("q160_hll_merge")(spark, dir)
      .select("merge_equals_direct", "n_registers", "register_checksum")
      .as[(Boolean, Long, Long)].collect().toSeq
    assert(eq, "per-source max-merge must equal direct registers")
    assert(nReg >= 60, s"2000 distinct tokens should fill ~all 64 registers, got $nReg")
    // brute force the direct registers
    val regs = (0 until 2000).map { j =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"tok$j".getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md5, 16)
      val reg = h % 64
      val rest = h / 64
      val rank = if (rest == 0) 27L
        else java.lang.Long.toBinaryString(rest & -rest).length.toLong
      (reg, rank)
    }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(checksum === regs.map { case (r, k) => (r + 1) * k }.sum)
    assert(nReg === regs.size.toLong)
    spark.catalog.clearCache()
  }

  test("q161: sequential attrition semantics on a crafted corpus") {
    val many = (1 to 12).map(i => s"w$i").mkString(" ") + " the"
    val dir = docsDir(Seq(
      (1L, "short text", "en", "s"), // fails min_words (stage 1)
      (2L, many + " " + ("x" * 25), "en", "s"), // fails word_len (stage 2)
      (3L, (1 to 12).map(i => s"v$i").mkString(" "), "en", "s"), // no stopword (3)
      (4L, many, "en", "s"), // survives
      (5L, many, "en", "s"), // dup of 4 -> fails dedup (stage 4)
      (6L, many + " extra", "en", "s") // survives
    ))
    val got = q("q161_attrition_funnel")(spark, dir)
      .orderBy("stage").as[(Int, String, Long, Long, Long)].collect()
    assert(got.map(r => (r._2, r._3, r._4, r._5)).toSeq === Seq(
      ("r_min_words", 6L, 1L, 5L),
      ("r_word_len", 5L, 1L, 4L),
      ("r_stopword", 4L, 1L, 3L),
      ("dedup_keep_first", 3L, 1L, 2L)))
    // chain consistency: each stage enters what the previous survived
    got.zip(got.tail).foreach { case (a, b) => assert(b._3 === a._5) }
  }
}
