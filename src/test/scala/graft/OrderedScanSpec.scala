package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered-scan mode (`sorted=true`): the K-way merge read of the writer's
  * sorted layout plus `SupportsReportOrdering` — and what it buys: a
  * storage-partitioned merge join with ZERO exchange and ZERO sort.
  */
class OrderedScanSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("token_id", LongType, nullable = true),
    StructField("ts_us", LongType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  /** Two append jobs through the V2 writer → ≥2 sorted part files per
    * shard with fully interleaved token ranges (batch B repeats batch A's
    * tokens at different timestamps), so chaining would NOT be sorted and
    * the merge is actually exercised. A null token and a null ts land in
    * batch B for the NULLS FIRST contract.
    */
  private def writeSortedLayout(): String = {
    val dir = Files.createTempDirectory("graft-ordered").toFile.getAbsolutePath
    def batch(offset: Long, withNulls: Boolean): DataFrame = {
      val rows = (for {
        s <- 0 until 4
        i <- 0 until 40
      } yield Row(s, (s + 4L * (i % 10)), offset + 1000L * i,
        if (i % 3 == 0) "purchase" else "click", (i % 100) * 1.0)) ++
        (if (withNulls) Seq(Row(2, null, 5L, "click", 1.0), Row(3, 9L, null, "click", 2.0))
         else Nil)
      spark.createDataFrame(
        spark.sparkContext.parallelize(scala.util.Random.shuffle(rows.toVector), 6), schema)
    }
    batch(0L, withNulls = false).write.format("graft-sharded").mode("append").save(dir)
    batch(500L, withNulls = true).write.format("graft-sharded").mode("append").save(dir)
    // ≥ 2 part files per shard
    (0 until 4).foreach { k =>
      val n = new java.io.File(dir, s"shard=$k").listFiles().count(_.isFile)
      assert(n >= 2, s"shard $k has $n part files; merge not exercised")
    }
    dir
  }

  private def withConfs[A](kvs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val prev = kvs.map { case (k, _) => k -> conf.getOption(k) }
    kvs.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("sorted=true merges part files into (token_id, ts_us) NULLS FIRST order per partition") {
    val dir = writeSortedLayout()
    // split=never keeps whole-shard partitions: the sorted read must K-way
    // MERGE its ≥2 interleaved part files (with split=auto each partition
    // would be a single already-sorted file range and prove nothing)
    val sortedDf = spark.read.format("graft-sharded")
      .option("sorted", "true").option("split", "never").load(dir)
    val plainDf = spark.read.format("graft-sharded").option("split", "never").load(dir)

    // identical multiset either way
    assert(sortedDf.count() === plainDf.count())
    assert(sortedDf.exceptAll(plainDf).count() === 0)
    assert(plainDf.exceptAll(sortedDf).count() === 0)

    // every partition's stream is non-decreasing by (token NULLS FIRST,
    // ts NULLS FIRST) — the chained (plain) read of interleaved parts is not
    def monotone(df: DataFrame): Boolean = {
      val perPart = df.select("token_id", "ts_us").rdd.mapPartitions { it =>
        def key(r: Row) = (if (r.isNullAt(0)) (0, 0L) else (1, r.getLong(0)),
          if (r.isNullAt(1)) (0, 0L) else (1, r.getLong(1)))
        val ks = it.map(key).toVector
        Iterator.single(ks.zip(ks.drop(1)).forall { case (a, b) =>
          import scala.math.Ordering.Implicits._
          a <= b
        })
      }.collect()
      perPart.forall(identity)
    }
    assert(monotone(sortedDf), "sorted=true partitions must be merge-ordered")
    assert(!monotone(plainDf), "fixture defect: chained read happens to be sorted — merge untested")
  }

  test("predicates and column pruning compose with the merge (filtered sorted stream stays sorted)") {
    val dir = writeSortedLayout()
    val q = spark.read.format("graft-sharded")
      .option("sorted", "true").option("split", "never").load(dir)
      .where(col("name") === "click").select("token_id", "ts_us")
    val rows = q.collect()
    val plain = spark.read.format("graft-sharded").load(dir)
      .where(col("name") === "click").select("token_id", "ts_us").collect()
    assert(rows.length === plain.length)
    assert(rows.map(_.toString).sorted.toSeq === plain.map(_.toString).sorted.toSeq)
  }

  test("storage-partitioned merge join on the sorted layout: ZERO exchange, ZERO sort") {
    val dir = writeSortedLayout()
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false") {
      def side(sorted: Boolean, nm: String) = spark.read.format("graft-sharded")
        .option("sorted", sorted.toString).load(dir)
        .where(col("name") === nm && col("token_id").isNotNull && col("ts_us").isNotNull)

      def planOf(sorted: Boolean): (DataFrame, String) = {
        val j = side(sorted, "purchase").as("p")
          .hint("merge")
          .join(side(sorted, "click").as("c"), Seq("shard", "token_id"))
          .select(col("token_id"), col("p.ts_us").as("p_ts"), col("c.ts_us").as("c_ts"))
        j.collect()
        (j, j.queryExecution.executedPlan.toString)
      }

      val (sortedJoin, sortedPlan) = planOf(sorted = true)
      assert(sortedPlan.contains("SortMergeJoin"), sortedPlan)
      assert(!sortedPlan.contains("Exchange"), s"SPJ must not shuffle:\n$sortedPlan")
      assert(!sortedPlan.contains("Sort "), // SortExec nodes render as "Sort ["
        s"reported ordering must eliminate the SMJ sorts:\n$sortedPlan")

      // negative control: same join without the sorted assertion sorts
      val (plainJoin, plainPlan) = planOf(sorted = false)
      assert(plainPlan.contains("Sort ["), s"control should sort:\n$plainPlan")

      // and both joins agree
      assert(sortedJoin.exceptAll(plainJoin).count() === 0)
      assert(plainJoin.exceptAll(sortedJoin).count() === 0)
    }
  }

  test("sorted pushed per-token aggregates take the group-sequential path and agree with the hash paths") {
    val dir = writeSortedLayout()
    // v values are small integers: sums are exact in any accumulation
    // order, so the three paths must agree bit-for-bit
    def agg(sorted: Boolean) = spark.read.format("graft-sharded")
      .option("sorted", sorted.toString).load(dir)
      .groupBy("token_id")
      .agg(count(lit(1)).as("n"), min("ts_us").as("mn"),
        max("ts_us").as("mx"), sum("v").as("sv"))
    val viaSeq = agg(sorted = true)
    val viaHash = agg(sorted = false)
    assert(viaSeq.count() > 0)
    assert(viaSeq.exceptAll(viaHash).count() === 0)
    assert(viaHash.exceptAll(viaSeq).count() === 0)
    // null token group included
    assert(viaSeq.where(col("token_id").isNull).count() === 1)
    // escape hatch: hash path over the same sorted read agrees too
    System.setProperty("graft.sharded.sortedAggPath", "false")
    try {
      val off = agg(sorted = true)
      assert(off.exceptAll(viaSeq).count() === 0 && viaSeq.exceptAll(off).count() === 0)
    } finally System.setProperty("graft.sharded.sortedAggPath", "true")
  }

  test("sorted=true on an UNSORTED layout fails the task loudly (never wrong join output)") {
    val dir = Files.createTempDirectory("graft-unsorted").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "shard=0.csv"))
    w.println("9,100,click,1.0"); w.println("3,50,click,2.0"); w.println("5,75,click,3.0")
    w.close()
    val e = intercept[Exception] {
      spark.read.format("graft-sharded").option("sorted", "true")
        .load(dir.getAbsolutePath).select("token_id", "ts_us").collect()
    }
    def causes(t: Throwable): Seq[Throwable] = if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage).exists(_.contains("sorted=true violated"))),
      s"expected the order guard, got: $e")
    // the same layout reads fine without the assertion
    assert(spark.read.format("graft-sharded").load(dir.getAbsolutePath).count() === 3)
  }

  test("ordering is not reported (and merge not claimed) when token_id is pruned or an agg/TopN is pushed") {
    val dir = writeSortedLayout()
    val pruned = spark.read.format("graft-sharded").option("sorted", "true").load(dir)
      .select("ts_us")
    pruned.collect()
    // ts alone is NOT sorted across tokens; the scan must not claim it —
    // an ORDER BY ts_us on the pruned projection must plan a Sort
    val q = pruned.orderBy("ts_us")
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("Sort ["),
      q.queryExecution.executedPlan.toString)

    // pushed agg on the sorted reader still matches the plain path
    val a = spark.read.format("graft-sharded").option("sorted", "true").load(dir)
      .groupBy("token_id").agg(count(lit(1)).as("n"), min("ts_us").as("m"))
    val b = spark.read.format("graft-sharded").load(dir)
      .groupBy("token_id").agg(count(lit(1)).as("n"), min("ts_us").as("m"))
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("part order is natural (e9 < e10) / manifest order — exact-ts ties resolve to newest ingest") {
    import graft.sources.{ShardedSignalSource, WriterFiles}
    // ADVICE r8: lexicographic name order put part-e10 BEFORE part-e9, so a
    // dedup=latest exact-(token,name,ts) tie picked the OLDER epoch's row —
    // and a FINAL optimize baked the wrong winner into the compacted part.
    val ord = ShardedSignalSource.naturalNameOrder
    assert(ord.compare("part-e9-0-0.csv", "part-e10-0-0.csv") < 0)
    assert(ord.compare("part-e2-11-0.csv", "part-e10-2-0.csv") < 0)
    assert(ord.compare("part-e10-0-0.csv", "part-e10-0-1.csv") < 0)
    assert(ord.compare("part-009.csv", "part-9.csv") != 0, "total order under zero-padding")
    // epoch names carry the query lineage tag (ADVICE r9); epoch order is
    // still numeric WITHIN a lineage, even when the tag ends in digits
    assert(ord.compare("part-ea1b2c3d4-9-0-0.csv", "part-ea1b2c3d4-10-0-0.csv") < 0)
    // batch names lead with a monotonic job tag (ADVICE r9): a later job's
    // partition-0 part sorts AFTER an earlier job's partition-1 part, and
    // legacy untagged parts (small leading numbers) sort before tagged ones
    assert(ord.compare("part-1755000000001-1-7-0.csv", "part-1755000000002-0-9-0.csv") < 0)
    assert(ord.compare("part-0-42-0.csv", "part-1755000000001-0-7-0.csv") < 0)

    val root = Files.createTempDirectory("graft-tiebreak").toFile
    val d = new java.io.File(root, "shard=0"); d.mkdirs()
    def part(name: String, v: Double): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(d, name))
      w.println(s"5,1000,temp,$v"); w.close() // same (token, ts, name) in every epoch
    }
    (1 to 10).foreach(e => part(s"part-e$e-0-0.csv", e * 1.0))

    def winner(): Double = spark.read.format("graft-sharded")
      .option("sorted", "true").option("dedup", "latest").load(root.getAbsolutePath)
      .collect().map(_.getDouble(4)).head

    assert(winner() === 10.0, "newest epoch (e10) must win the exact-ts tie")

    // manifest order overrides name order: it IS the ingest order (commits
    // append; StoreOptimize prepends its merged part)
    WriterFiles.writeManifest(d, (1 to 10).map(e => s"part-e$e-0-0.csv").reverse)
    assert(winner() === 1.0, "manifest order must rule when a manifest exists")
  }
}
