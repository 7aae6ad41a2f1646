package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.jobs.StoreOptimize
import graft.sources.{GranuleIndex, PartStreamWriter, ShardRowPredicate, ShardedPartitionReader, ShardedSignalSource}

/** The granule (mark) index: frame-per-granule writing, multi-frame
  * decode, binary-searched granule selection for pushed token/ts
  * predicates, compressed-part splitting at granule boundaries, and the
  * post-FINAL point-read guarantee (<10% of rows parsed).
  */
class GranuleIndexSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("token_id", LongType, nullable = true),
    StructField("ts_us", LongType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  private def df(rows: Seq[Row], parts: Int = 2): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), schema)

  private def tmp(): java.io.File = Files.createTempDirectory("graft-granule").toFile

  /** One sorted part with `nTok` tokens × `perTok` rows via the shared
    * writer core; returns the part file.
    */
  private def writePart(dir: java.io.File, codec: String, granuleRows: Int,
      nTok: Int = 40, perTok: Int = 25): java.io.File = {
    val name = s"part-test0${StoreOptimize.ext(codec)}"
    val pw = PartStreamWriter.staged(dir, name, codec, granuleRows)
    for (t <- 0 until nTok; i <- 0 until perTok)
      pw.writeFields(t.toLong, 1000L * i, s"sig_${i % 3}", i * 0.5)
    pw.finishStaged()
    pw.publish()
    new java.io.File(dir, name)
  }

  private def readAll(part: java.io.File, pred: ShardRowPredicate): (Seq[(Long, Long)], Long) = {
    // through the granule-aware per-file path (PartFileRows is package-private
    // to sources; ShardedShardReader routes through it)
    val r = new graft.sources.ShardedShardReader(Seq(part.getAbsolutePath), 0, schema, pred)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    while (r.next()) {
      val row = r.get()
      // NullTs sentinel: pred-surviving null-ts rows must stay comparable
      out += ((row.getLong(1), if (row.isNullAt(2)) NullTs else row.getLong(2)))
    }
    r.close()
    (out.toSeq, r.skippedRows)
  }

  private val NullTs = Long.MinValue + 7
  private val NullTok = Long.MinValue + 9

  for (codec <- Seq("none", "gzip", "zstd")) {
    test(s"[$codec] granule-rolled part round-trips whole and per-granule (multi-frame decode)") {
      val dir = tmp()
      val part = writePart(dir, codec, granuleRows = 64) // 1000 rows → 16 granules
      val idx = GranuleIndex.read(part)
      assert(idx.isDefined && idx.get.size === math.ceil(1000.0 / 64).toInt)

      // WHOLE-file read must decode every concatenated frame/member
      val (all, _) = readAll(part, ShardRowPredicate.Trivial)
      assert(all.length === 1000, s"whole read got ${all.length}")

      // point lookup: exactly token 17's rows, via granule-selected ranges
      val pred = ShardRowPredicate.Trivial.copy(tokenIn = Some(Set(17L)))
      val ranges = GranuleIndex.selectRanges(part, pred)
      assert(ranges.isDefined && ranges.get.nonEmpty && ranges.get.length < idx.get.size,
        s"selection must prune granules: $ranges")
      val (got, skipped) = readAll(part, pred)
      assert(got.length === 25 && got.forall(_._1 === 17L))
      // parsed rows = emitted + skipped — granule-pruned rows never parse
      assert(got.length + skipped < 1000 / 4,
        s"granule skip must avoid parsing most rows (parsed ${got.length + skipped})")

      // token + ts range narrows further and stays exact
      val pred2 = ShardRowPredicate.Trivial.copy(
        tokenIn = Some(Set(17L)), tsMin = Some((8000L, true)), tsMax = Some((16000L, false)))
      val (got2, _) = readAll(part, pred2)
      assert(got2 === (8 until 16).map(i => (17L, 1000L * i)))

      // absent token: empty result, and only the boundary granule parsed
      // (the index bounds where t COULD be; true absence is the part-level
      // minmax/bloom sidecar's job at planning time)
      val predAbsent = ShardRowPredicate.Trivial.copy(tokenIn = Some(Set(99999L)))
      val (got3, skipped3) = readAll(part, predAbsent)
      assert(got3.isEmpty && skipped3 <= 2 * 64,
        s"absent-token lookup must parse at most the boundary granules, parsed $skipped3")
    }
  }

  test("a FINAL-compacted zstd store answers a point query parsing <10% of the shard (r9 Next #1)") {
    val dir = tmp().getAbsolutePath
    // 400 tokens × 30 generations over 8 signal names, two shards, small
    // parts → real merge; FINAL keeps newest generation per (token, name):
    // 200 tokens × 8 names = 1600 surviving rows per shard
    val rows = for (t <- 0L until 400L; g <- 0 until 30)
      yield Row((t % 2).toInt, t, 1000L * g, s"sig_${g % 8}", g * 1.0)
    df(rows).write.format("graft-sharded").option("maxPartBytes", "65536")
      .mode("append").save(dir)
    StoreOptimize.optimize(spark, dir, codec = "zstd", finalDedup = true, granuleRows = 32)

    val d = new java.io.File(dir, "shard=0")
    val parts = graft.sources.ShardedSignalSource.activeParts(d)
    assert(parts.nonEmpty)
    parts.foreach(p => assert(GranuleIndex.read(p).isDefined,
      s"compacted part ${p.getName} must carry a granule index"))

    // count LINES PARSED for a single-token lookup across the shard's parts
    val pred = ShardRowPredicate.Trivial.copy(tokenIn = Some(Set(42L)))
    var parsed = 0L
    var hits = 0L
    parts.foreach { p =>
      GranuleIndex.selectRanges(p, pred) match {
        case Some(ranges) => ranges.foreach { case (s, e) =>
          val r = new ShardedPartitionReader(p.getAbsolutePath, 0, schema, pred, s, e, exact = true)
          while (r.next()) hits += 1
          parsed += r.linesRead
          r.close()
        }
        case None => fail(s"compacted part ${p.getName} must be granule-selectable")
      }
    }
    assert(hits === 8, "FINAL collapsed to one row per (token, name)")
    val totalRows = parts.flatMap(graft.sources.PartStats.read).map(_.rows).sum
    assert(totalRows === 1600L)
    assert(parsed < totalRows / 10,
      s"point read must parse <10% of the shard ($parsed of $totalRows)")

    // and the plain table read (the q202 shape) still matches: multi-frame
    // zstd parts decode end to end
    val plain = spark.read.format("graft-sharded").load(dir)
    assert(plain.count() === 3200)
    assert(plain.where("v < 22.0").count() === 0, "only newest generations survive")
    // pushed point query through the DSv2 path agrees
    val viaScan = plain.where(col("shard") === 0 && col("token_id") === 42L)
      .select("token_id", "ts_us", "v").collect()
    assert(viaScan.length === 8)
    assert(viaScan.map(_.getDouble(2)).sorted === (22 to 29).map(_.toDouble).toArray)
  }

  test("granule selection ≡ full scan under randomized keys, nulls, duplicates and ts bounds") {
    // the property that keeps a mark index honest: for ANY sorted part
    // (boundary-straddling duplicate keys, null tokens first, null ts
    // first within a token) and ANY token/ts predicate, reading the
    // selected granule ranges equals filtering a full scan
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 8; codec <- Seq("none", "zstd")) {
      val dir = tmp()
      val granuleRows = 1 + rnd.nextInt(16)
      val nRows = 50 + rnd.nextInt(400)
      // small key space forces duplicates ACROSS granule boundaries
      val keys = Seq.fill(nRows)((
        if (rnd.nextInt(10) == 0) null else java.lang.Long.valueOf(rnd.nextInt(12).toLong),
        if (rnd.nextInt(10) == 0) null else java.lang.Long.valueOf(rnd.nextInt(5).toLong * 1000)))
        .sortBy { case (t, s) =>
          (t != null, Option(t).map(_.longValue()).getOrElse(0L),
            s != null, Option(s).map(_.longValue()).getOrElse(0L))
        }
      val name = s"part-prop$trial${StoreOptimize.ext(codec)}"
      val pw = PartStreamWriter.staged(dir, name, codec, granuleRows)
      keys.foreach { case (t, s) => pw.writeFields(t, s, "n", 1.0) }
      pw.finishStaged(); pw.publish()
      val part = new java.io.File(dir, name)

      for (_ <- 0 until 6) {
        val toks = Set.fill(1 + rnd.nextInt(3))(rnd.nextInt(14).toLong)
        val lo = if (rnd.nextBoolean()) Some((rnd.nextInt(5).toLong * 1000 - 500, rnd.nextBoolean())) else None
        val hi = if (rnd.nextBoolean()) Some((rnd.nextInt(5).toLong * 1000 + 500, rnd.nextBoolean())) else None
        val pred = ShardRowPredicate.Trivial.copy(tokenIn = Some(toks), tsMin = lo, tsMax = hi)
        val (got, _) = readAll(part, pred)
        def tsOk(s: java.lang.Long): Boolean =
          // SQL null semantics: a ts bound rejects null; no bound keeps it
          (lo.isEmpty && hi.isEmpty) || (s != null &&
            lo.forall { case (b, inc) => if (inc) s >= b else s > b } &&
            hi.forall { case (b, inc) => if (inc) s <= b else s < b })
        val want = keys.filter { case (t, s) =>
          t != null && toks.contains(t.longValue()) && tsOk(s)
        }.map(kv => (kv._1.longValue(),
          if (kv._2 == null) NullTs else kv._2.longValue()))
        assert(got === want,
          s"trial=$trial codec=$codec granuleRows=$granuleRows toks=$toks lo=$lo hi=$hi")

        // TIME-ONLY predicate (r11): no token component — selection rides
        // the g2 per-granule ts bands and must still equal the full scan
        // (null tokens included, null ts rejected by any bound)
        if (lo.isDefined || hi.isDefined) {
          val predT = ShardRowPredicate.Trivial.copy(tsMin = lo, tsMax = hi)
          val r = new graft.sources.ShardedShardReader(
            Seq(part.getAbsolutePath), 0, schema, predT)
          val gotT = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          while (r.next()) {
            val row = r.get()
            gotT += ((if (row.isNullAt(1)) NullTok else row.getLong(1),
              if (row.isNullAt(2)) NullTs else row.getLong(2)))
          }
          r.close()
          val wantT = keys.filter { case (_, s) => tsOk(s) }.map(kv => (
            if (kv._1 == null) NullTok else kv._1.longValue(),
            if (kv._2 == null) NullTs else kv._2.longValue()))
          assert(gotT.toSeq === wantT,
            s"time-only trial=$trial codec=$codec granuleRows=$granuleRows lo=$lo hi=$hi")
        }
      }
    }
  }

  test("a time-window scan of a FINAL-compacted part parses only band-overlapping granules (r11)") {
    val dir = tmp().getAbsolutePath
    // 200 tokens × 40 generations, ts spread over [0, 40s): after FINAL
    // each part spans nearly the whole ts range (part-level minmax prunes
    // nothing) — only the per-granule g2 bands can cut a time window
    val rows = for (t <- 0L until 200L; g <- 0 until 40)
      yield Row(0, t, 1000000L * g + t, "sig", g * 1.0)
    df(rows).write.format("graft-sharded").option("maxPartBytes", "65536")
      .mode("append").save(dir)
    StoreOptimize.optimize(spark, dir, codec = "zstd", finalDedup = true, granuleRows = 32)

    val d = new java.io.File(dir, "shard=0")
    val parts = graft.sources.ShardedSignalSource.activeParts(d)
    assert(parts.nonEmpty)
    // FINAL kept generation 39 only: every surviving ts ≈ 39s. A window
    // over the FIRST quarter of history must parse almost nothing; one
    // over the last bucket must find all 200 rows.
    val early = ShardRowPredicate.Trivial.copy(
      tsMin = Some((0L, true)), tsMax = Some((10000000L, false)))
    val late = ShardRowPredicate.Trivial.copy(tsMin = Some((39000000L, true)))
    def run(pred: ShardRowPredicate): (Long, Long) = {
      var parsed = 0L; var hits = 0L
      parts.foreach { p =>
        GranuleIndex.selectRanges(p, pred) match {
          case Some(ranges) => ranges.foreach { case (s, e) =>
            val r = new ShardedPartitionReader(p.getAbsolutePath, 0, schema, pred, s, e,
              exact = true)
            while (r.next()) hits += 1
            parsed += r.linesRead
            r.close()
          }
          case None => fail(s"compacted part ${p.getName} must be band-selectable: $pred")
        }
      }
      (hits, parsed)
    }
    val (hitsE, parsedE) = run(early)
    assert(hitsE === 0, "nothing current is that old after FINAL")
    val total = parts.flatMap(graft.sources.PartStats.read).map(_.rows).sum
    assert(total === 200L)
    assert(parsedE < total / 4,
      s"an out-of-window scan must skip by bands ($parsedE of $total parsed)")
    val (hitsL, parsedL) = run(late)
    assert(hitsL === 200L, s"the live window holds every current row, got $hitsL")
    assert(parsedL <= total, "sanity")

    // and the DSv2 read agrees with a plain filter
    val viaScan = spark.read.format("graft-sharded").load(dir)
      .where(col("ts_us") >= 39000000L).count()
    assert(viaScan === 200L)
  }

  test("reported statistics shrink to the granule-selected bytes for point scans") {
    val dir = tmp().getAbsolutePath
    val rows = (0L until 40000L).map(t => Row(0, t % 1000, 1000L * t, "sig", t * 1.0))
    df(rows).write.format("graft-sharded").option("granuleRows", "256")
      .mode("append").save(dir)
    import org.apache.spark.sql.sources.EqualTo
    def bytesFor(filters: Array[org.apache.spark.sql.sources.Filter]): Long = {
      val b = new graft.sources.ShardedScanBuilder(dir)
      b.pushFilters(filters)
      b.build().asInstanceOf[graft.sources.ShardedScan].estimateStatistics()
        .sizeInBytes().getAsLong
    }
    val full = bytesFor(Array.empty)
    val point = bytesFor(Array(EqualTo("token_id", 7L)))
    assert(point > 0 && point < full / 10,
      s"a point scan must report granule-selected bytes ($point of $full) — " +
        "the broadcast-eligibility signal")
  }

  test("driver-side planning reads each part's mark file at most once per scan (ADVICE r10)") {
    val dir = tmp().getAbsolutePath
    // several granule-indexed parts per shard
    (0 until 4).foreach { i =>
      df((0L until 4000L).map(t => Row(0, t % 200, 1000L * t + i, "sig", t * 1.0)), parts = 1)
        .write.format("graft-sharded").option("granuleRows", "128")
        .mode("append").save(dir)
    }
    val nParts = graft.sources.ShardedSignalSource
      .activeParts(new java.io.File(dir, "shard=0")).size
    assert(nParts >= 4)

    import org.apache.spark.sql.sources.EqualTo
    val b = new graft.sources.ShardedScanBuilder(dir)
    b.pushFilters(Array(EqualTo("token_id", 7L)))
    val scan = b.build().asInstanceOf[graft.sources.ShardedScan]
    val before = graft.sources.GranuleIndex.readCount.get()
    // Spark invokes statistics repeatedly during planning; split planning
    // consults granule cuts on top — all of it must share ONE parse per part
    (0 until 5).foreach(_ => scan.estimateStatistics())
    (0 until 2).foreach(_ => scan.planInputPartitions())
    val reads = graft.sources.GranuleIndex.readCount.get() - before
    assert(reads <= nParts,
      s"repeated planning must not repeat mark-file IO ($reads reads for $nParts parts)")
  }

  test("compressed parts byte-range split at granule boundaries (split=always)") {
    val dir = tmp().getAbsolutePath
    val rows = (0L until 20000L).map(t => Row(0, t % 500, 1000L * t, "sig", t * 1.0))
    df(rows).write.format("graft-sharded")
      .option("codec", "zstd").option("granuleRows", "256")
      .mode("append").save(dir)
    // tiny splitBytes: the zstd part must fan out at granule cuts
    val split = spark.read.format("graft-sharded")
      .option("split", "always").option("splitBytes", "8192").load(dir)
      .select("token_id", "ts_us", "v")
    val nParts = split.rdd.getNumPartitions
    assert(nParts > 1, s"compressed part with a granule index must split, got $nParts partition(s)")
    val whole = spark.read.format("graft-sharded").option("split", "never").load(dir)
      .select("token_id", "ts_us", "v")
    assert(split.count() === 20000)
    assert(split.exceptAll(whole).count() === 0 && whole.exceptAll(split).count() === 0,
      "granule-aligned splits must reproduce the exact row multiset")
  }

  test("bounded compaction: merge groups level down and maxPartBytes rolls key-range outputs") {
    val dir = tmp().getAbsolutePath
    // 64 tiny appends → 64 parts per shard (the streaming-epoch shape)
    (0 until 64).foreach { e =>
      df((0L until 50L).map(t => Row(0, t, 1000L * e, s"sig_$e", e * 1.0)), parts = 1)
        .write.format("graft-sharded").mode("append").save(dir)
    }
    val d = new java.io.File(dir, "shard=0")
    assert(ShardedSignalSource.activeParts(d).size === 64)
    val before = spark.read.format("graft-sharded").load(dir).collect().map(_.toSeq).toSet

    val res = StoreOptimize.optimize(spark, dir, codec = "none",
      maxPartBytes = 16 * 1024, mergeGroupSize = 4, granuleRows = 128)
    assert(res.size === 1 && res.head.partsBefore === 64)
    val outs = ShardedSignalSource.activeParts(d)
    assert(outs.size > 1, "maxPartBytes must roll the merge output into several parts")
    assert(outs.forall(_.getName.startsWith("part-opt-")))
    // rolled outputs have ascending, non-overlapping token ranges (the
    // minmax-prunable key-range property the roll exists for)
    val stats = outs.map(p => graft.sources.PartStats.read(p).get)
    stats.sliding(2).foreach {
      case Seq(a, b) => assert(a.tokMax.get <= b.tokMin.get,
        s"rolled parts must be key-disjoint: ${a.tokMax} vs ${b.tokMin}")
      case _ => ()
    }
    assert(res.head.mergedParts === outs.map(_.getName))
    val after = spark.read.format("graft-sharded").load(dir).collect().map(_.toSeq).toSet
    assert(after === before, "leveled bounded merge must be content-identical")
    // every output carries full sidecars + lineage naming all 64 leaves
    outs.foreach { p =>
      assert(graft.sources.PartStats.read(p).isDefined)
      val lf = new java.io.File(d, s".${p.getName}.lineage")
      assert(lf.isFile, s"merged part ${p.getName} must record lineage")
      val lines = scala.io.Source.fromFile(lf, "UTF-8").getLines().toVector
      val leaves = lines.takeWhile(_ != "=direct")
      assert(leaves.length === 64, s"leaf-expanded lineage, got ${leaves.length}")
      assert(lines.contains("=direct") && lines.drop(leaves.length + 1).nonEmpty,
        "lineage must also record the direct inputs (compacted-offset proof)")
    }
  }

  test("concurrent maintenance is refused by the lock; a stale lock is broken") {
    val dir = tmp().getAbsolutePath
    df((0L until 20L).map(t => Row(0, t, t, "a", 1.0)))
      .write.format("graft-sharded").option("maxPartBytes", "64").mode("append").save(dir)
    val lock = new java.io.File(dir, "_maintenance.lock")
    new java.io.FileOutputStream(lock).close() // a live maintenance job
    val ex = intercept[IllegalStateException] {
      StoreOptimize.optimize(spark, dir)
    }
    assert(ex.getMessage.contains("maintenance"))
    assert(lock.isFile, "a refused job must not delete the holder's lock")
    // stale lock (holder crashed an hour+ ago): broken and re-taken
    assert(lock.setLastModified(System.currentTimeMillis() - 2L * 60 * 60 * 1000))
    val res = StoreOptimize.optimize(spark, dir)
    assert(res.nonEmpty, "a stale lock must be broken, not wedge the store")
    assert(!lock.isFile, "lock released after completion")
  }
}
