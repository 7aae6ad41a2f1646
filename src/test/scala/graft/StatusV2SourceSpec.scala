package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** DSv2 pushdown source spec: results match the plain JSON reader and the
  * plan proves the filters/pruning actually reached the scan.
  */
class StatusV2SourceSpec extends SparkTestBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-v2src")
    val docs = Seq(
      """{"id":"a","subject":"1","source":"s","specversion":"1.0","time":"2024-01-01T00:00:00Z","data":{"speed":10}}""",
      """{"id":"b","subject":"1","source":"s","specversion":"1.0","time":"2024-01-01T00:10:00Z","data":{"speed":20}}""",
      """{"id":"c","subject":"2","source":"s","specversion":"1.0","time":"2024-01-01T00:20:00Z","data":{"speed":30}}""",
      """not json at all""",
      """{"id":"d","subject":"2","source":"s","specversion":"1.0","time":"2024-01-01T00:30:00Z","data":{"speed":40}}"""
    )
    Files.writeString(d.resolve("part-0.ndjson"), docs.take(3).mkString("\n"))
    Files.writeString(d.resolve("part-1.ndjson"), docs.drop(3).mkString("\n"))
    d.toString
  }

  private def read = spark.read.format("graft-status").load(dir)

  test("scan returns all well-formed docs; malformed lines skipped") {
    assert(read.count() === 4)
    assert(read.select("data").where(col("data").contains("40")).count() === 1)
  }

  test("reported statistics are the real file bytes, so small snapshots broadcast") {
    val onDisk = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".")).map(_.length()).sum
    assert(read.queryExecution.optimizedPlan.stats.sizeInBytes === BigInt(onDisk),
      "the scan must report its on-disk size, not the never-broadcast default")
    // join a big synthetic fact against this 5-line snapshot: BHJ on data
    val fact = spark.range(0, 5000).selectExpr("CAST(id % 3 AS STRING) as subject", "id as x")
    val j = fact.join(read.select("subject", "id"), Seq("subject"))
    j.collect()
    val nodes = allExecNodes(j.queryExecution.executedPlan).map(_.getClass.getSimpleName)
    assert(nodes.exists(_.contains("BroadcastHashJoin")),
      s"true (tiny) reported stats must yield BHJ, got:\n${nodes.mkString(", ")}")
  }

  test("runtime filtering is not advertised once pruning drops subject from the output") {
    // PartitionPruning resolves filterAttributes against the PRUNED output
    // and throws on a miss — a projection without `subject` must simply
    // plan without runtime filtering (the r7 filterAttributes guard)
    val fact = spark.range(0, 100).selectExpr("CAST(id AS STRING) as id2", "id as x")
    val j = fact.join(read.select("id", "time"), fact("id2") === col("id"))
    assert(j.count() === 0 || j.count() > 0) // planning must not throw
  }

  test("subject + half-open time range are pushed and applied") {
    val q = read.where(
      col("subject") === "1" &&
        col("time") >= lit("2024-01-01 00:05:00") &&
        col("time") < lit("2024-01-01 00:30:00")
    )
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[") && plan.contains("EqualTo(subject,1)"), plan)
    assert(plan.contains("GreaterThanOrEqual(time,") && plan.contains("LessThan(time,"), plan)
    val rows = q.select("id").collect().map(_.getString(0))
    assert(rows.toSeq === Seq("b"))
  }

  test("accepted IsNotNull and duplicate range bounds are enforced in the reader") {
    val d = Files.createTempDirectory("graft-v2nn")
    Files.writeString(d.resolve("part-0.ndjson"), Seq(
      """{"id":"a","subject":"1","source":"s","specversion":"1.0","time":"2024-01-01T00:00:00Z","data":{}}""",
      """{"id":"b","subject":"1","source":"s","specversion":"1.0","time":"2024-01-01T00:10:00Z","data":{}}""",
      """{"id":"c","subject":"1","source":"s","specversion":"1.0","time":"2024-01-01T00:20:00Z","data":{}}""",
      """{"id":"u1","subject":"1","source":"s","specversion":"1.0","data":{}}""",
      """{"id":"u2","source":"s","specversion":"1.0","time":"2024-01-01T00:20:00Z","data":{}}"""
    ).mkString("\n"))
    val df = spark.read.format("graft-status").load(d.toString)
    assert(df.count() === 5)
    // a pushed (and therefore plan-removed) IsNotNull must drop rows HERE
    assert(df.where(col("time").isNotNull).count() === 4)
    assert(df.where(col("subject").isNotNull).count() === 4)
    assert(df.where(col("time").isNotNull && col("subject").isNotNull).count() === 3)
    // duplicate range conjuncts: the TIGHTER bound applies (max of >=, min of <)
    val dup = df.where(col("time") >= lit("2024-01-01 00:00:00") &&
        col("time") >= lit("2024-01-01 00:05:00"))
      .select("id").collect().map(_.getString(0)).toSet
    assert(dup === Set("b", "c", "u2"))
    val dupLt = df.where(col("time") < lit("2024-01-01 00:30:00") &&
        col("time") < lit("2024-01-01 00:10:00"))
      .select("id").collect().map(_.getString(0)).toSet
    assert(dupLt === Set("a"))
    // contradictory subject equalities yield nothing
    assert(df.where(col("subject") === "1" && col("subject") === "2").count() === 0)
  }

  test("column pruning: data payload not read unless required") {
    val q = read.select("id", "subject")
    val scanLine = q.queryExecution.executedPlan.toString.split("\n").find(_.contains("BatchScan")).get
    assert(!scanLine.contains("data#"), scanLine) // payload pruned out of the scan output
    assert(q.schema.fieldNames.toSeq === Seq("id", "subject"))
    assert(q.count() === 4)
  }

  test("limit pushes into the scan (per-partition early stop)") {
    val q = read.limit(2)
    assert(q.collect().length === 2)
  }

  test("topN on time pushes into the scan, both directions") {
    val q = read.orderBy(col("time").desc).limit(2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("topN=2 time DESC"), plan)
    assert(q.select("id").collect().map(_.getString(0)).toSeq === Seq("d", "c"))
    val qa = read.orderBy(col("time").asc).limit(2)
    assert(qa.queryExecution.executedPlan.toString.contains("topN=2 time ASC"))
    assert(qa.select("id").collect().map(_.getString(0)).toSeq === Seq("a", "b"))
  }

  test("topN keeps null-time rows available for the global merge") {
    val d = Files.createTempDirectory("graft-v2topn-null")
    Files.writeString(d.resolve("n.ndjson"), Seq(
      """{"id":"t1","subject":"1","source":"s","specversion":"1.0","time":"2024-01-01T00:00:01Z","data":{}}""",
      """{"id":"t2","subject":"1","source":"s","specversion":"1.0","time":"2024-01-01T00:00:02Z","data":{}}""",
      """{"id":"x1","subject":"1","source":"s","specversion":"1.0","data":{}}""",
      """{"id":"x2","subject":"1","source":"s","specversion":"1.0","time":"not-a-time","data":{}}"""
    ).mkString("\n"))
    val read = spark.read.format("graft-status").load(d.toString)
    // NULLS LAST (default desc): k=3 must surface one null-time row
    val got = read.orderBy(col("time").desc_nulls_last).limit(3)
      .select("id").collect().map(_.getString(0))
    assert(got.take(2).toSeq === Seq("t2", "t1"))
    assert(Set("x1", "x2").contains(got(2)), got.mkString(","))
    // NULLS FIRST: the null-time rows win
    val first = read.orderBy(col("time").desc_nulls_first).limit(3)
      .select("id").collect().map(_.getString(0))
    assert(first.take(2).toSet === Set("x1", "x2"))
    assert(first(2) === "t2")
  }

  test("topN on a non-time column is NOT pushed (scan stays correct)") {
    val q = read.orderBy(col("subject").desc, col("time").desc).limit(2)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("topN="), plan)
    assert(q.select("id").collect().map(_.getString(0)).toSeq === Seq("d", "c"))
  }

  test("topN bounds per-split output: K rows per range, not the full scan") {
    val d = Files.createTempDirectory("graft-v2topn")
    val n = 5000
    val lines = (0 until n).map { i =>
      s"""{"id":"doc$i","subject":"${i % 7}","source":"s","specversion":"1.0","time":"2024-01-01T${"%02d".format(i / 3600)}:${"%02d".format((i / 60) % 60)}:${"%02d".format(i % 60)}Z","data":{"speed":$i}}"""
    }
    Files.writeString(d.resolve("big.ndjson"), lines.mkString("\n"))
    val split = spark.read.format("graft-status")
      .option("splitBytes", 64 * 1024)
      .load(d.toString)
    val k = 3
    val q = split.orderBy(col("time").desc).limit(k)
    assert(q.select("id").collect().map(_.getString(0)).toSeq
      === Seq(s"doc${n - 1}", s"doc${n - 2}", s"doc${n - 3}"))
    // the scan shipped ≤ K rows per byte range — not the 5000-row corpus
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .find(_.getClass.getSimpleName == "BatchScanExec").get
    val parts = split.rdd.getNumPartitions
    val out = scan.metrics("numOutputRows").value
    assert(out <= parts.toLong * k, s"scan emitted $out rows over $parts ranges")
    assert(out < n.toLong / 2, s"scan emitted $out — looks like a full scan")
  }

  test("runtime subject filter reaches the readers via re-planned partitions") {
    val conf = spark.conf
    val prev = Seq("spark.sql.optimizer.dynamicPartitionPruning.useStats",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
      .map(k => k -> conf.getOption(k))
    conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10.0")
    try {
      // the dim must keep a real Filter node (a pre-folded LocalRelation
      // fails DPP's selective-predicate check)
      val dim = spark.range(0, 3).select(col("id").cast("string").as("subject"))
        .where(col("subject") === "1")
      val j = read.join(dim, Seq("subject"))
      assert(j.collect().length === 2) // docs a, b
      val planStr = j.queryExecution.executedPlan.toString
      assert(planStr.contains("RuntimeFilters: [dynamicpruning"),
        s"the dim join must inject a runtime subject filter:\n$planStr")
      val scan = findScan(j, "graft_status")
      // subject-2 documents were dropped at parse time, not in the join
      assert(scan.metrics("numOutputRows").value === 2,
        s"scan emitted ${scan.metrics("numOutputRows").value} rows — runtime filter not applied")
    } finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("reader composes topN with a runtime subject set (heap over survivors only)") {
    // Plan-level co-occurrence is impossible (TopN pushes only when
    // Sort+Limit sit directly over the scan; runtime filters require a
    // join above it), but the READER must still honor both together —
    // pin it at the unit level: subject-2 docs are c (00:20) and d
    // (00:30); top-1 desc over the surviving set is d.
    val file = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".ndjson"))
      .map(_.getAbsolutePath).sorted
    val rows = file.flatMap { f =>
      val r = new graft.sources.StatusPartitionReader(
        new graft.sources.LineDocSource(
          new graft.sources.ByteRangeLines(f, 0, Long.MaxValue)), Some(Set("2")),
        Array.empty, graft.sources.StatusV2Source.Schema, -1, 1, true)
      val buf = scala.collection.mutable.Buffer[String]()
      while (r.next()) buf += r.get().getUTF8String(0).toString // id
      r.close()
      buf
    }
    // per-split top-1 over subject-2 survivors: part-0 contributes c,
    // part-1 contributes d — the global merge (TakeOrdered) picks d
    assert(rows.sorted.toSeq === Seq("c", "d"))
  }

  test("skipped malformed lines surface as a scan metric") {
    val df = read
    assert(df.collect().length === 4) // executes THIS plan, populating its metrics
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .find(_.getClass.getSimpleName == "BatchScanExec").get
    val m = scan.metrics.get("skippedLines")
    assert(m.isDefined, s"metrics: ${scan.metrics.keys}")
    assert(m.get.value === 1L) // the one non-JSON line
  }

  test("byte-range splits: one big file reads in many partitions, identically") {
    val d = Files.createTempDirectory("graft-v2split")
    val n = 5000
    val lines = (0 until n).map { i =>
      s"""{"id":"doc$i","subject":"${i % 7}","source":"s","specversion":"1.0","time":"2024-01-01T00:00:${"%02d".format(i % 60)}Z","data":{"speed":$i}}"""
    }
    Files.writeString(d.resolve("big.ndjson"), lines.mkString("\n"))
    val whole = spark.read.format("graft-status").load(d.toString)
    val split = spark.read.format("graft-status")
      .option("splitBytes", 64 * 1024) // force ~10 ranges over the ~700 KB file
      .load(d.toString)
    assert(whole.rdd.getNumPartitions === 1)
    assert(split.rdd.getNumPartitions > 4, s"got ${split.rdd.getNumPartitions} partitions")
    assert(split.count() === n.toLong)
    // Identical content regardless of where the byte boundaries landed.
    assert(split.select("id").collect().map(_.getString(0)).sorted
      === whole.select("id").collect().map(_.getString(0)).sorted)
    // Pushdown still applies per range.
    assert(split.where(col("subject") === "3").count() ===
      whole.where(col("subject") === "3").count())
  }

  test("geo_point location parses to a lat/lon double struct, malformed nulls") {
    val d = Files.createTempDirectory("graft-v2geo")
    Files.writeString(d.resolve("geo.ndjson"), Seq(
      """{"id":"g1","subject":"1","source":"s","specversion":"1.0","time":"2024-01-01T00:00:00Z","location":{"lat":"41.90639","lon":"-87.92368"},"data":{}}""",
      """{"id":"g2","subject":"1","source":"s","specversion":"1.0","time":"2024-01-01T00:00:01Z","location":{"lat":"not-a-number","lon":"-87.9"},"data":{}}""",
      """{"id":"g3","subject":"1","source":"s","specversion":"1.0","time":"2024-01-01T00:00:02Z","data":{}}"""
    ).mkString("\n"))
    val rows = spark.read.format("graft-status").load(d.toString)
      .select("id", "location.lat", "location.lon")
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).sortBy(_._1)
    assert(rows(0) === (("g1", Some(41.90639), Some(-87.92368))))
    assert(rows(1) === (("g2", None, Some(-87.9)))) // ignore_malformed: bad lat nulls
    assert(rows(2)._1 === "g3" )
    val g3loc = spark.read.format("graft-status").load(d.toString)
      .where(col("id") === "g3").select("location").head()
    assert(g3loc.isNullAt(0))
  }

  test("V2 source composes with the signal-explosion operator") {
    val out = graft.ops.SignalExplode.explodeSignals(
      read.select(col("subject"), col("source"), col("time"), col("data")),
      graft.schema.SignalDefinitions.resolve(Seq("Vehicle.Speed"))
    )
    assert(out.count() === 4)
    assert(out.agg(sum("valueNumber")).head().getDouble(0) === 100.0)
  }
}
