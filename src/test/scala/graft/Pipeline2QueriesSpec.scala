package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Semantics of the round-4 pipeline tranche (q121-q125) on crafted
  * corpora — same style as [[PipelineQueriesSpec]]: tiny parquet dirs,
  * the DECLARED query fns, exact expected values.
  */
class Pipeline2QueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-pipeline2").toString
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q121: Bloom filter has zero false negatives; membership is exact-companioned") {
    val rows = q("q121_bloom_filter")(spark, "/root/testdata/sf0.01")
      .as[(String, Boolean, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, inBloom, inTrain, noFn) =>
      assert(noFn, s"pinned column must be TRUE for $w")
      if (inTrain) assert(inBloom, s"false negative on $w")
    }
    // the probe split genuinely exercises the positive path
    assert(rows.exists(_._3), "expected at least one probe word present in train")
  }

  test("q122: posting lists are df-ranked, capped, stopword-free") {
    // 'apple' in 3 docs, 'banana' in 2, 'cherry' in 1; 'the' is stopword
    val dir = docsDir(Seq(
      (3L, "the apple banana", "en", "s"),
      (1L, "the apple", "en", "s"),
      (2L, "apple banana cherry", "en", "s")
    ))
    val got = q("q122_inverted_index")(spark, dir)
      .orderBy(col("df").desc, col("term"))
      .as[(String, Long, Long, String)].collect()
    assert(got.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq(("apple", 3L, 3L), ("banana", 2L, 2L), ("cherry", 1L, 1L)))
    // posting order is doc_id ASC regardless of insertion order
    val expected = spark.sql("SELECT md5('1,2,3')").as[String].head()
    assert(got(0)._4 === expected)
  }

  test("q123: decile boundaries on 1..10 are exactly 1..9") {
    val dir = Files.createTempDirectory("graft-orders").toString
    (1 to 10).map(i => (i.toLong, 1L, "O", i.toDouble,
        new java.sql.Timestamp(86400000L * i), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = q("q123_equi_depth")(spark, dir)
      .as[(String, String, Double)].collect()
      .map { case (_, dec, v) => dec -> v }.toMap
    // rank ⌈10·i/10⌉ = i in the sorted values 1..10
    assert(got === (1 to 9).map(i => s"d$i" -> i.toDouble).toMap)
  }

  test("q124: add-one-smoothed bigram probabilities in exact ppm") {
    // unigrams a:3 b:2 c:1 → V=3; bigrams 'a b':2, 'a c':1
    // p(a b) = 3e6 div 6 = 500000; p(a c) = 2e6 div 6 = 333333
    val dir = docsDir(Seq(
      (1L, "a b", "en", "s"), (2L, "a b", "en", "s"), (3L, "a c", "en", "s")))
    val got = q("q124_bigram_lm")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(got === Array((1L, 1L, 500000L), (2L, 1L, 500000L), (3L, 1L, 333333L)))
  }

  test("q126: encode replays the trained merges; fertility is exact ppm") {
    // vocab: 'abcdef' x3, 'xy' x1. Merges (count desc, then lexicographic):
    // r1 (a,b) r2 (ab,c) r3 (abc,d) r4 (abcd,e) r5 (abcde,f) — 'abcdef'
    // collapses to ONE token, 'xy' (never the top pair) stays at two chars.
    val dir = docsDir(Seq(
      (1L, "abcdef abcdef", "en", "s1"), (2L, "abcdef xy", "en", "s2")))
    val got = q("q126_bpe_encode")(spark, dir)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array(("s1", 2L, 2L, 1000000L), ("s2", 2L, 3L, 1500000L)))
  }

  test("q127: z-values interleave both dimensions into the bucket id") {
    val dir = Files.createTempDirectory("graft-lineitem").toString
    // corner probes: (0,0) and (3,1) land in bucket 0; the single-dimension
    // maxima land MID-range (21 for x-only, 42 for y-only) — the interleave
    // property a lexicographic sort key cannot have; (65535,65535) is 63.
    Seq((0L, 0L), (3L, 1L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
      .toDF("l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = q("q127_zorder")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got === Map(
      0L -> ((2L, 0L, 3L, 0L, 1L)),
      21L -> ((1L, 65535L, 65535L, 0L, 0L)),
      42L -> ((1L, 0L, 0L, 65535L, 65535L)),
      63L -> ((1L, 65535L, 65535L, 65535L, 65535L))))
  }

  test("ZOrderLayout: per-file spans shrink on BOTH dimensions") {
    import graft.jobs.ZOrderLayout
    // 256x256 uniform grid -> 16 z-ordered files. Ideal z-partitioning gives
    // 64x64 blocks (span 64 each); range-boundary sampling and z-curve seam
    // crossings can widen a few files, so assert the MEAN span stays well
    // under half the domain — a single-column sort pins the OTHER dimension
    // at the full 256 in every file.
    val grid = spark.range(65536L)
      .selectExpr("id div 256 AS x", "id % 256 AS y")
    val out = Files.createTempDirectory("graft-zorder").toString + "/t"
    ZOrderLayout.write(grid.toDF(), "x", "y", out, 16)
    val spans = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .as[(String, Long, Long)].collect()
    assert(spans.length >= 8, s"expected ~16 files, got ${spans.length}")
    val (ax, ay) = (spans.map(_._2).sum / spans.length, spans.map(_._3).sum / spans.length)
    assert(ax <= 128, s"mean x-span $ax should be far under the 256 domain")
    assert(ay <= 128, s"mean y-span $ay should be far under the 256 domain")
  }

  test("q125: only overlapping source pairs appear, Jaccard is exact ppm") {
    // s1 has 5-grams {g1, g2}; s2 has {g1}; s3 shares nothing
    val dir = docsDir(Seq(
      (1L, "w1 w2 w3 w4 w5 w6", "en", "s1"),
      (2L, "w1 w2 w3 w4 w5", "en", "s2"),
      (3L, "x1 x2 x3 x4 x5", "en", "s3")
    ))
    val got = q("q125_contamination")(spark, dir)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got === Array(("s1", "s2", 2L, 1L, 1L, 500000L)))
  }

  test("q128: duplicate segments keep only their first occurrence; docs rebuild in order") {
    // doc 1: segments A B (12 tokens -> 10+2); doc 2 repeats segment A as its
    // FIRST 10 tokens then fresh C; doc 3 is exactly segment A -> fully dupped.
    val segA = (1 to 10).map(i => s"a$i").mkString(" ")
    val tailB = "b1 b2"
    val segC = (1 to 10).map(i => s"c$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, s"$segA $tailB", "en", "s"),
      (2L, s"$segA $segC", "en", "s"),
      (3L, segA, "en", "s")
    ))
    val got = q("q128_segment_dedup")(spark, dir)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, String)].collect()
    // doc 3 vanishes (its only segment is owned by doc 1); doc 2 keeps just C
    assert(got.map(r => (r._1, r._2, r._3)).toSeq === Seq((1L, 2L, 2L), (2L, 2L, 1L)))
    val md5of = (t: String) => spark.sql(s"SELECT md5('$t')").as[String].head()
    assert(got(0)._4 === md5of(s"$segA $tailB"))
    assert(got(1)._4 === md5of(segC))
  }

  test("q129: at most 2 copies survive per canonical text, lowest doc_ids win") {
    // 'Hello World' in 4 trivially-reformatted variants + one unique doc
    val dir = docsDir(Seq(
      (10L, "hello world", "en", "s"),
      (7L, "Hello, WORLD!", "en", "s"),
      (9L, "hello   world", "en", "s"),
      (8L, "hello world.", "en", "s"),
      (1L, "something else", "en", "s")
    ))
    val got = q("q129_dup_cap")(spark, dir)
      .orderBy(col("n_dups").desc, col("doc_id"))
      .as[(Long, String, Long, Long)].collect()
    assert(got.map(r => (r._1, r._3, r._4)).toSeq ===
      Seq((7L, 1L, 4L), (8L, 2L, 4L), (1L, 1L, 1L)))
  }
}
