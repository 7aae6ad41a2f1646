package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Dedup-operator specs on small controlled corpora: known duplicates in,
  * known pairs out.
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 1
    (4L, "completely different words about spark shuffles and partitions and joins here"),
    (5L, "another unrelated document mentioning catalyst optimizer rules and codegen stages only")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeper = min id") {
    val out = Dedup.exactDuplicates(corpus, "doc_id", "text").collect()
    assert(out.length === 4) // 1+2 collapse
    val dupGroup = out.find(_.getLong(2) == 2L).get
    assert(dupGroup.getLong(1) === 1L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashDedup(corpus, "doc_id", "text", k = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("exact jaccard with prefix filtering matches brute-force jaccard") {
    val out = Dedup.ngramJaccardJoin(corpus, "doc_id", "text", k = 3, tNum = 1, tDen = 2)
    val got = out.select("id_a", "id_b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // Brute force over distinct 3-shingle sets computed independently.
    val sets = Dedup.shingleSets(corpus, "doc_id", "text", 3)
      .as[(Long, Seq[Long])].collect().toMap
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = sets(a).toSet.intersect(sets(b).toSet).size
      jac = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if jac >= 0.5
    } yield (a, b) -> jac).toMap
    assert(got === expected)
    assert(got.contains((1L, 2L)) && got((1L, 2L)) === 1.0)
  }

  test("containment finds the excerpt direction that jaccard misses") {
    val base = "the quick brown fox jumps over the lazy dog near the river"
    val excerptCorpus = Seq(
      (1L, base), // excerpt
      (2L, base + " bank today while many other unrelated words follow in this much longer document about rivers"), // superset of 1
      (3L, "completely different words about spark shuffles and partitions and joins here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentJoin(excerptCorpus, "doc_id", "text", k = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    // 1 is fully contained in 2; 2 is NOT (>= 90%) contained in 1
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 === 1.0))
    assert(!pairs.exists(p => p._1 == 2L && p._2 == 1L))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // and symmetric jaccard at the same τ would have missed the pair
    val jac = Dedup.ngramJaccardJoin(excerptCorpus, "doc_id", "text", k = 3, tNum = 9, tDen = 10)
      .as[(Long, Long, Double)].collect()
    assert(!jac.exists(p => Set(p._1, p._2) == Set(1L, 2L)))
  }

  test("simhash: identical docs at hamming 0, near dups close, unrelated far") {
    val out = Dedup.simhashDedup(corpus, "doc_id", "text", maxDist = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Number](2).longValue)).toMap
    assert(out((1L, 2L)) === 0L)
    assert(out.get((1L, 3L)).exists(_ <= 8L))
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("duplicate clusters: connected components across transitive pairs") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("incremental minhash: new batch dedups against a persisted index, old corpus untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-index")
    val (bands, sets) = Dedup.minhashIndexTables(corpus, "doc_id", "text", k = 3)
    bands.write.parquet(s"$dir/bands")
    sets.write.parquet(s"$dir/sets")

    // New batch: a near-dup of old doc 1, an unrelated doc, and two
    // exact dups WITHIN the batch.
    val fresh = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
      (11L, "entirely novel content speaking of embeddings vector search and recall levels"),
      (12L, "entirely novel content speaking of embeddings vector search and recall levels")
    ).toDF("doc_id", "text")

    val pairs = Dedup.minhashDedupIncremental(
      fresh,
      oldBands = spark.read.parquet(s"$dir/bands"),
      oldSets = spark.read.parquet(s"$dir/sets"),
      "doc_id", "text", k = 3, threshold = 0.5
    ).select("id_a", "id_b").as[(Long, Long)].collect().toSet

    assert(pairs.contains((1L, 10L)), pairs.toString) // new × old near-dup found
    assert(pairs.contains((11L, 12L)), pairs.toString) // new × new exact dup found
    // old × old pairs never re-emitted (the batch-scaling property)
    assert(!pairs.exists(p => p._1 <= 5L && p._2 <= 5L), pairs.toString)
    // and nothing links the unrelated new docs to the old corpus
    assert(!pairs.exists(p => (p._2 == 11L || p._2 == 12L) && p._1 <= 5L), pairs.toString)

    // Equivalence oracle: incremental pairs == full-corpus minhash pairs
    // restricted to those touching a new id.
    val full = Dedup.minhashDedup(corpus.union(fresh), "doc_id", "text", k = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .filter(p => p._1 >= 10L || p._2 >= 10L)
    assert(pairs === full)

    // Id reuse resolves NEW-WINS: doc 4 re-synced with text that now
    // duplicates doc 1 — the pair must reflect the NEW text (4 was
    // unrelated to everything in the old corpus), with no fan-out from
    // the stale rows.
    val resync = Seq(
      (4L, "the quick brown fox jumps over the lazy dog near the river bank today")
    ).toDF("doc_id", "text")
    val re = Dedup.minhashDedupIncremental(
      resync,
      oldBands = spark.read.parquet(s"$dir/bands"),
      oldSets = spark.read.parquet(s"$dir/sets"),
      "doc_id", "text", k = 3, threshold = 0.5
    ).select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(re.count(p => (p._1, p._2) == (1L, 4L)) === 1, re.toSeq.toString) // exactly once, no stale fan-out
    assert(re.find(p => (p._1, p._2) == (1L, 4L)).get._3 === 1.0) // judged on the NEW text
  }

  test("pointer jumping converges in ~log(diameter) rounds on a chain graph") {
    // 0-1-2-…-63: plain one-hop min propagation needs ~63 rounds to pull
    // label 0 to the far end; hop+jump must stay logarithmic.
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.duplicateClustersWithRounds(chain)
    val got = labels.as[(Long, Long)].collect()
    assert(got.length === 64)
    assert(got.forall(_._2 == 0L), got.filter(_._2 != 0L).take(5).toSeq.toString)
    assert(rounds <= 12, s"pointer jumping degraded: $rounds rounds for a 64-chain")
  }

  test("greedy resolution keeps docs never marked as a pair's larger id") {
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.keepAfterDedup(corpus.select($"doc_id"), "doc_id", pairs)
      .as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 4L, 5L))
  }

  test("embedding near-dup pairs respect the cosine threshold") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f)), // ~0.995 vs 1
      (3L, Array(0.0f, 1.0f, 0.0f)) // orthogonal
    ).toDF("vec_id", "embedding")
    val out = Similarity.embeddingNearDupPairs(
      Similarity.prepare(vecs, "vec_id", "embedding"), threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  test("exact-substring dup spans: interval union length is exact") {
    // shared: one 59-char run duplicated across docs 1 and 2 at different
    // offsets; doc 3 shares nothing 10-chars long with anyone
    val shared = "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKLMNOPQRSTUVW" // 59 chars
    val docs = Seq(
      (1L, "XXXXX" + shared + "YYYYYYYYYY"), // shared at offset 5
      (2L, shared + "Zmore trailing text here to pad things"), // shared at offset 0
      (3L, "a completely different body of text long enough to have windows but no duplicates anywhere")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupSpans(docs, "doc_id", "text", gramLen = 10)
      .select("doc_id", "n_grams", "n_dup_grams", "dup_chars")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // a 59-char shared run has 50 duplicated 10-gram positions, consecutive,
    // so the union is (50-1)·1 + 10 = exactly the 59 shared characters
    assert(out(1L) === ((65L, 50L, 59L))) // len 74 → 65 windows
    assert(out(2L)._2 === 50L)
    assert(out(2L)._3 === 59L)
    assert(!out.contains(3L)) // no duplicated window anywhere
  }
}
