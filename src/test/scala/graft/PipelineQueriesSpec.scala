package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Semantics of the round-3 pipeline operators (q76-q83) on crafted
  * corpora: each test writes a tiny documents/embeddings parquet dir and
  * runs the DECLARED query fn against it, so the exact code the driver
  * checks is the code under test.
  */
class PipelineQueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-pipeline").toString
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q76: per-language quota is enforced and deterministic") {
    val out = q("q76_lang_quota")(spark, "/root/testdata/sf0.01")
    val perLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang.values.forall(_ <= 30))
    assert(perLang("en") === 30) // en has 218 docs, the cap must bite
    val again = q("q76_lang_quota")(spark, "/root/testdata/sf0.01")
    assert(out.collect().toSet === again.collect().toSet)
  }

  test("q77: emails and long digit runs are redacted, counts reported") {
    val dir = docsDir(Seq(
      (1L, "contact bob@example.com or 12345678 now", "en", "s"),
      (2L, "no pii here", "en", "s"),
      (3L, "a@b.io c@d.org 999", "en", "s")
    ))
    val got = q("q77_pii_redact")(spark, dir)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(got(0)._3 === 1 && got(0)._4 === 1)
    assert(got(1)._3 === 0 && got(1)._4 === 0)
    assert(got(2)._3 === 2 && got(2)._4 === 0) // 999 is too short to redact
    // redaction really happened: hash equals md5 of the expected string
    val expected = spark.sql(
      "SELECT md5('contact <EMAIL> or <NUM> now')").as[String].head()
    assert(got(0)._2 === expected)
  }

  test("q78: packing starts a new sequence when the budget is crossed") {
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    // 100+100+100 tokens: docs 1,2,3 start at cum-before 0/100/200 -> seq 0;
    // doc 4 starts at 300 -> seq 1.
    val dir = docsDir(Seq(
      (1L, words(100), "en", "s"), (2L, words(100), "en", "s"),
      (3L, words(100), "en", "s"), (4L, words(100), "en", "s"),
      (5L, words(10), "fr", "s")
    ))
    val got = q("q78_sequence_pack")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("en", 0L, 3L, 300L), ("en", 1L, 1L, 100L), ("fr", 0L, 1L, 10L)))
  }

  test("q79: repetition fractions on a crafted doc") {
    val dir = docsDir(Seq((1L, "a a b", "en", "s"), (2L, "x", "en", "s")))
    val got = q("q79_repetition")(spark, dir)
      .orderBy("doc_id").as[(Long, Double, Double, Double)].collect()
    assert(math.abs(got(0)._2 - (1.0 - 2.0 / 3.0)) < 1e-15) // dup words
    assert(math.abs(got(0)._3 - 2.0 / 3.0) < 1e-15) // top word 'a'
    assert(got(0)._4 === 0.0) // bigrams "a a","a b" distinct
    assert(got(1)._2 === 0.0 && got(1)._3 === 1.0 && got(1)._4 === 0.0)
  }

  test("q80: count-min estimate never undercounts and is exact-companioned") {
    val rows = q("q80_countmin")(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows.length === 20)
    rows.foreach { case (w, exact, est, ok) =>
      assert(ok && est >= exact, s"$w est=$est exact=$exact")
    }
  }

  test("q81: shared chunks are dropped, unique chunks survive reassembly") {
    val boiler = "B" * 64
    val dir = docsDir(Seq(
      (1L, boiler + "alpha unique one", "en", "s"),
      (2L, boiler + "beta unique two", "en", "s"),
      (3L, boiler + "gamma unique three", "en", "s"),
      (4L, "all original text here", "en", "s")
    ))
    val got = q("q81_boilerplate")(spark, dir)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    // docs 1-3 share the 64-char boilerplate chunk (df=3 >= 3): dropped
    assert(got.take(3).forall { case (_, n, b, _) => n === 2L && b === 1L })
    assert(got(3)._3 === 0L)
    // doc 4's clean hash is the doc itself (single chunk, kept)
    val expect = spark.sql("SELECT md5('all original text here')").as[String].head()
    assert(got(3)._4 === expect)
    // doc 1's clean hash drops the boilerplate prefix
    val expect1 = spark.sql("SELECT md5('alpha unique one')").as[String].head()
    assert(got(0)._4 === expect1)
  }

  test("q85: each curation stage filters what it should") {
    val good = "the quick brown fox jumps over one lazy sleeping dog" // 10 words, has stopword
    val dir = docsDir(Seq(
      (1L, good, "en", "s"),
      (2L, "The quick brown fox, jumps over one lazy sleeping dog!", "en", "s"), // dup of 1 after canon
      (3L, "too short", "en", "s"), // fails min-words
      (4L, "w w w w w w w w w the", "en", "s"), // quality ~0.16 < 0.5
      (5L, good.replace("dog", "cat"), "fr", "s")
    ))
    // expected: docs 1 and 5 survive rules+dedup+quality; the sample stage
    // keeps those whose keyed hash bucket < 3 — replay the declared
    // predicate to compute the expectation.
    val sampled = Seq(1L, 5L).filter { id =>
      spark.sql(s"SELECT pmod(cast(conv(substring(md5('q85|$id'), 1, 8), 16, 10) AS BIGINT), 5) < 3")
        .as[Boolean].head()
    }
    val got = q("q85_curation_pipeline")(spark, dir)
      .as[(String, String, Long, Long)].collect()
    assert(got.map(_._3).sum === sampled.size.toLong)
    if (sampled.contains(1L))
      assert(got.find(_._1 == "en").get._4 === 10L)
  }

  test("q84: exactly K docs, stable across runs, unbiased across langs") {
    val a = q("q84_exact_k_sample")(spark, "/root/testdata/sf0.01")
    assert(a.count() === 100)
    val b = q("q84_exact_k_sample")(spark, "/root/testdata/sf0.01")
    assert(a.collect().toSet === b.collect().toSet)
    // hashed selection should touch every language in a 500-doc corpus
    assert(a.select("lang").distinct().count() === 5)
  }

  test("q82: chunks tile each document exactly") {
    val dir = docsDir(Seq((1L, "x" * 130, "en", "s"), (2L, "short", "en", "s")))
    val got = q("q82_chunking")(spark, dir)
      .orderBy("doc_id", "chunk_ix").as[(Long, Long, String, Long)].collect()
    assert(got.filter(_._1 == 1L).map(_._4).toSeq === Seq(64L, 64L, 2L))
    assert(got.filter(_._1 == 2L).map(_._4).toSeq === Seq(5L))
    // corpus-level tiling invariant: chunk lengths sum back to n_chars
    val sums = q("q82_chunking")(spark, "/root/testdata/sf0.01")
      .groupBy("doc_id").agg(sum("chunk_len").as("s"))
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
    assert(sums.join(docs, "doc_id").where(col("s") =!= col("n")).count() === 0)
  }

  test("q83: int8 quantization checksum and error bound on a crafted vector") {
    val dir = Files.createTempDirectory("graft-emb").toString
    Seq((1L, Seq(1.0f, -0.5f, 0.25f), 0), (2L, Seq(0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = q("q83_embedding_quant")(spark, dir)
      .orderBy("vec_id").as[(Long, Double, Long, Double)].collect()
    // scale = 1/127; q = [127, floor(-63.5+0.5)=-63, floor(31.75+0.5)=32]
    assert(got(0)._3 === 127L - 63L + 32L)
    val scale = 1.0 / 127.0
    // quantization error can never exceed one half-step
    assert(got(0)._4 <= scale / 2 + 1e-12)
    assert(got(1)._2 === 0.0 && got(1)._3 === 0L && got(1)._4 === 0.0)
    // corpus-wide: error bounded by half a step for every vector
    val all = q("q83_embedding_quant")(spark, "/root/testdata/sf0.01")
    assert(all.where(col("max_q_err") > col("scale") / 2 + lit(1e-12)).count() === 0)
  }

  test("q102: CDC chunks tile each document and survive a prefix edit") {
    // tiling: contiguous spans summing to n_chars, corpus-wide
    val out = q("q102_cdc_chunking")(spark, "/root/testdata/sf0.01")
    val sums = out.groupBy("doc_id").agg(sum("chunk_len").as("s"))
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
    assert(sums.join(docs, "doc_id").where(col("s") =!= col("n")).count() === 0)
    // spans are contiguous: every chunk starts where the previous stopped
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("chunk_ix")
    val gaps = out
      .withColumn("prev_end", lag(col("chunk_start") + col("chunk_len"), 1, 0).over(w))
      .where(col("chunk_start") =!= col("prev_end"))
    assert(gaps.count() === 0)

    // content-defined stability: prepend an edit to a real document and
    // the chunking only changes near the edit — every chunk of the
    // original except (at most) the first two reappears verbatim in the
    // edited document's chunk set. Fixed-stride chunking (q82) shifts
    // EVERY boundary under the same edit.
    val text = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .orderBy("doc_id").select("text").as[String].head()
    val a = docsDir(Seq((1L, text, "en", "s")))
    val b = docsDir(Seq((1L, "PREFIX EDIT >> " + text, "en", "s")))
    val ha = q("q102_cdc_chunking")(spark, a)
      .orderBy("chunk_ix").select("chunk_hash").as[Long].collect()
    val hb = q("q102_cdc_chunking")(spark, b)
      .select("chunk_hash").as[Long].collect().toSet
    assert(ha.length >= 3, s"document too short to have ${ha.length} chunks; pick a longer one")
    val missing = ha.drop(2).filterNot(hb)
    assert(missing.isEmpty, s"chunks beyond the edit region changed: $missing")
  }

  test("q103: split follows the bucket rule, covers every doc, is stable") {
    val out = q("q103_hash_split")(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, String)].collect()
    assert(out.length === 500)
    assert(out.forall { case (_, b, _) => b >= 0 && b < 100 })
    assert(out.forall { case (_, b, s) =>
      s == (if (b < 90) "train" else if (b < 95) "val" else "test")
    })
    // all three splits non-empty and roughly proportioned on 500 docs
    val n = out.groupBy(_._3).map { case (k, v) => k -> v.size }
    assert(n("train") > 400 && n("val") > 5 && n("test") > 5)
    val again = q("q103_hash_split")(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, String)].collect()
    assert(out.toSet === again.toSet)
  }

  test("q101: identical vectors collapse to the lowest id, loners survive") {
    val dir = Files.createTempDirectory("graft-semdedup").toString
    val v = Seq(1.0f, 0.0f, 0.0f)
    val far = Seq(0.0f, 1.0f, 0.0f)
    Seq((0L, v, 0), (1L, v, 0), (2L, v, 0), (3L, far, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = q("q101_dedup_semantic")(spark, dir)
      .orderBy("dropped_id").as[(Long, Long, Double)].collect()
    // 0,1,2 share a list (identical → same nearest centroid, lowest-cid
    // tiebreak); 3 is orthogonal and alone. Dropped: 1 and 2, keeper 0.
    assert(got.map(r => (r._1, r._2)).toSeq === Seq((1L, 0L), (2L, 0L)))
    assert(got.forall(_._3 > 0.99))
  }

  test("q104: target-language-exclusive tokens dominate the ranking") {
    val dir = docsDir(
      (1L to 6L).map(i => (i, "alpha alpha shared", "en", "s")) ++
        (7L to 12L).map(i => (i, "beta beta shared", "de", "s")))
    val got = q("q104_importance_weights")(spark, dir).as[(Long, Long)].collect()
    val score = got.toMap
    // en docs: alpha appears only in en → w=10^6 per occurrence;
    // de docs: beta never appears in en → w=0; 'shared' splits 50/50.
    assert((1L to 6L).forall(i => score(i) > score(7L)))
    assert((7L to 12L).map(score).distinct.size === 1)
    assert(score(1L) === 2L * 1000000L + 500000L)
    assert(score(7L) === 500000L)
  }

  test("q105: hub word outranks leaves, leaves tie, ranks are stable") {
    val dir = docsDir(Seq((1L, "hub x hub y hub z", "en", "s")))
    val got = q("q105_textrank")(spark, dir).as[(String, Long)].collect()
    val rank = got.toMap
    assert(rank("hub") > rank("x"))
    assert(rank("x") === rank("y") && rank("y") === rank("z"))
    // deterministic integer arithmetic: identical ranks on a re-run
    val again = q("q105_textrank")(spark, dir).as[(String, Long)].collect()
    assert(got.toSet === again.toSet)
  }
}
