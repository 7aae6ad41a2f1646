package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{PartStats, TokenBloom}

/** Per-part token Bloom sidecars (r9) — the text store's `bloom_filter`
  * SKIP INDEX: point lookups prune parts whose [min,max] token range
  * overlaps the probe but which do not CONTAIN the probed token — the
  * interleaved-key case minmax can never cut.
  */
class TokenBloomSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("token_id", LongType, nullable = true),
    StructField("ts_us", LongType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  test("bloom arithmetic: no false negatives, low false positives, base64 round trip") {
    val b = TokenBloom.empty()
    val present = (0L until 1000L).map(_ * 7919L + 13L)
    present.foreach(TokenBloom.add(b, _))
    assert(present.forall(TokenBloom.mightContain(b, _)), "bloom must never false-negative")
    val absent = (0L until 10000L).map(_ * 7919L + 14L)
    val fp = absent.count(TokenBloom.mightContain(b, _))
    assert(fp < 300, s"~1% fpp expected at 1000 keys, got $fp/10000")

    val enc = TokenBloom.toBase64(b)
    assert(TokenBloom.fromBase64(enc).get.toSeq === b.toSeq)
    assert(TokenBloom.fromBase64("###").isEmpty, "garbage decodes to no-bloom, not an error")
    // sidecar round trip carries the bloom; 7-field pre-r9 lines still parse
    val s = PartStats(5L, Some(1L), Some(9L), None, None, None, None, Some(b))
    val back = PartStats.deserialize(PartStats.serialize(s)).get
    assert(back.tokenBloom.get.toSeq === b.toSeq)
    val old = PartStats.deserialize("5,1,9,,,,").get
    assert(old.tokenBloom.isEmpty && old.rows === 5L)
  }

  /** Two parts per shard with fully OVERLAPPING token ranges but DISJOINT
    * token sets (multiples of 4 vs multiples of 4 plus 2) — the adversarial
    * interleave: minmax keeps both parts, only the bloom can prune.
    */
  private def interleavedStore(): String = {
    val dir = Files.createTempDirectory("graft-bloom").toFile.getAbsolutePath
    def batch(offset: Long): DataFrame =
      spark.createDataFrame(spark.sparkContext.parallelize(
        (0L until 25L).map(i => Row(0, offset + 4L * i, 1000L * i, "sig", 1.0)), 2), schema)
    batch(0L).write.format("graft-sharded").mode("append").save(dir)  // tokens 0,4,…,96
    batch(2L).write.format("graft-sharded").mode("append").save(dir)  // tokens 2,6,…,98
    assert(new java.io.File(dir, "shard=0").listFiles()
      .count(f => f.isFile && !f.getName.startsWith(".")) === 2)
    dir
  }

  test("static point lookup prunes the range-overlapping part that lacks the token") {
    val dir = interleavedStore()
    val q = spark.read.format("graft-sharded").load(dir)
      .where(col("token_id") === 4L).select("ts_us", "v")
    val rows = q.collect()
    assert(rows.length === 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("statsPrunedParts=1"),
      s"the bloom must prune the token-free part minmax cannot:\n$plan")

    // a token in NEITHER part: both parts pruned, zero partitions planned
    val none = spark.read.format("graft-sharded").load(dir)
      .where(col("token_id") === 5L)
    assert(none.count() === 0)
    assert(none.queryExecution.executedPlan.toString.contains("statsPrunedParts=2"))

    // control: a token from the OTHER part prunes the first instead
    val other = spark.read.format("graft-sharded").load(dir)
      .where(col("token_id") === 6L)
    assert(other.count() === 1)
    assert(other.queryExecution.executedPlan.toString.contains("statsPrunedParts=1"))
  }

  test("runtime (DPP-handed) token IN-sets use the bloom cut; large sets skip it safely") {
    import graft.sources.{ShardedScan, ShardedScanBuilder, ShardPartition}
    import org.apache.spark.sql.sources.In
    val dir = interleavedStore()
    def planned(tokens: Seq[Long]): Seq[ShardPartition] = {
      val scan = new ShardedScanBuilder(dir).build().asInstanceOf[ShardedScan]
      scan.filter(Array[org.apache.spark.sql.sources.Filter](
        In("token_id", tokens.map(t => java.lang.Long.valueOf(t): Any).toArray)))
      scan.planInputPartitions().map(_.asInstanceOf[ShardPartition]).toSeq
    }
    // small runtime set hitting only the even-offset part: one part planned
    val hit = planned(Seq(4L, 8L))
    assert(hit.map(_.files.size).sum === 1, s"bloom must cut the other part: $hit")
    // small set hitting neither: nothing planned
    assert(planned(Seq(5L, 9L)).isEmpty)
    // beyond the small-set threshold the bloom is skipped (range cut only) —
    // correctness unaffected, both parts read
    val big = planned((0L until 100L).map(_ * 4L + 1L)) // 100 absent tokens
    assert(big.map(_.files.size).sum === 2, "large sets fall back to the range cut")
  }

  test("distinct-name SET sidecar prunes parts by pushed name predicates; overflow disables it") {
    val dir = Files.createTempDirectory("graft-nameset").toFile.getAbsolutePath
    def batch(names: Seq[String]): DataFrame =
      spark.createDataFrame(spark.sparkContext.parallelize(
        names.zipWithIndex.flatMap { case (n, i) =>
          (0L until 10L).map(t => Row(0, t, 100L * i + t, n, 1.0)) }, 2), schema)
    batch(Seq("click")).write.format("graft-sharded").mode("append").save(dir)
    batch(Seq("purchase")).write.format("graft-sharded").mode("append").save(dir)
    // a third part with > MaxNameSet distinct names: set index omitted
    batch((0 until PartStats.MaxNameSet + 5).map(i => s"n$i"))
      .write.format("graft-sharded").mode("append").save(dir)

    val q = spark.read.format("graft-sharded").load(dir)
      .where(col("name") === "purchase")
    assert(q.count() === 10)
    val plan = q.queryExecution.executedPlan.toString
    // the click-only part pruned by its name set; the overflow part kept
    // (no set recorded) and filtered at parse time instead
    assert(plan.contains("statsPrunedParts=1"), s"name-set must prune:\n$plan")

    // a name no part has: set-indexed parts prune, overflow part read
    val none = spark.read.format("graft-sharded").load(dir)
      .where(col("name") === "nope")
    assert(none.count() === 0)
    assert(none.queryExecution.executedPlan.toString.contains("statsPrunedParts=2"))

    // IN over both real names keeps both set-indexed parts
    val both = spark.read.format("graft-sharded").load(dir)
      .where(col("name").isin("click", "purchase"))
    assert(both.count() === 20)
    assert(both.queryExecution.executedPlan.toString.contains("statsPrunedParts=0") ||
      !both.queryExecution.executedPlan.toString.contains("statsPrunedParts="))
  }

  test("name-set codec: empty set distinct from absent; legacy 8-field sidecars parse") {
    val s = PartStats(3L, Some(1L), Some(2L), None, None, None, None,
      None, Some(Set("a b", "c")))
    val back = PartStats.deserialize(PartStats.serialize(s)).get
    assert(back.nameSet === Some(Set("a b", "c")))
    val empty = PartStats(3L, None, None, None, None, None, None, None, Some(Set.empty))
    assert(PartStats.deserialize(PartStats.serialize(empty)).get.nameSet === Some(Set.empty))
    val legacy8 = PartStats.deserialize(
      PartStats.serialize(PartStats(1L, Some(1L), Some(1L), None, None, None, None,
        Some(TokenBloom.empty()), None))).get
    assert(legacy8.nameSet.isEmpty && legacy8.tokenBloom.isDefined)
  }

  test("StoreOptimize's merged part carries a fresh bloom") {
    val dir = interleavedStore()
    graft.jobs.StoreOptimize.optimize(spark, dir)
    val d = new java.io.File(dir, "shard=0")
    val part = d.listFiles().filter(f => f.isFile && !f.getName.startsWith(".")
      && !f.getName.startsWith("_")).head
    val stats = PartStats.read(part).get
    assert(stats.rows === 50L)
    val bloom = stats.tokenBloom.get
    assert((0L until 25L).forall(i => TokenBloom.mightContain(bloom, 4L * i)))
    assert((0L until 25L).forall(i => TokenBloom.mightContain(bloom, 4L * i + 2L)))
    // and the compacted store still answers the point lookup
    assert(spark.read.format("graft-sharded").load(dir)
      .where(col("token_id") === 4L).count() === 1)
  }
}
