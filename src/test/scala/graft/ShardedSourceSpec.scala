package graft

import java.nio.file.Files

/** The storage-partitioned source must (a) read correctly, (b) let a
  * per-shard aggregation plan with ZERO exchange — the clustering comes
  * from the layout, not a shuffle — and (c) storage-partition-join two
  * datasets in the same layout without shuffling either side.
  */
class ShardedSourceSpec extends SparkTestBase {

  private def writeShards(nShards: Int, rowsPerShard: Int): String = {
    val dir = Files.createTempDirectory("graft-sharded").toFile
    (0 until nShards).foreach { s =>
      val f = new java.io.File(dir, s"shard=$s.csv")
      val w = new java.io.PrintWriter(f)
      (0 until rowsPerShard).foreach { i =>
        val token = s + (i % 7) * nShards // token_id % nShards == shard
        w.println(s"$token,${1000000L * i},sig_${i % 3},${i * 0.5}")
      }
      w.close()
    }
    dir.getAbsolutePath
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

  private def withBucketing[A](f: => A): A =
    withConfs("spark.sql.sources.v2.bucketing.enabled" -> "true")(f)

  test("reads rows and prunes columns") {
    val dir = writeShards(4, 30)
    val df = spark.read.format("graft-sharded").load(dir)
    assert(df.count() === 120)
    assert(df.columns.toSeq === Seq("shard", "token_id", "ts_us", "name", "v"))
    val pruned = df.select("token_id").queryExecution.executedPlan.toString
    assert(pruned.contains("ReadSchema") || !pruned.contains("name"),
      s"column pruning should drop unused fields:\n$pruned")
    // every row's token lands in its file's shard
    assert(df.where("CAST(token_id % 4 AS INT) <> shard").count() === 0)
  }

  test("per-shard aggregation plans with zero exchange") {
    val dir = writeShards(4, 50)
    withBucketing {
      val agg = spark.read.format("graft-sharded").load(dir)
        .groupBy("shard", "token_id")
        .agg(org.apache.spark.sql.functions.sum("v").as("sv"),
          org.apache.spark.sql.functions.count("*").as("n"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(!plan.contains("Exchange"),
        s"key-grouped layout must elide the aggregation shuffle:\n$plan")
      // and the numbers are still right
      val total = agg.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
      assert(total === 200)
    }
  }

  test("shard=K directory layout (partitionBy output) reads key-grouped") {
    val dir = Files.createTempDirectory("graft-sharded-dirs").toFile
    (0 until 4).foreach { s =>
      val sub = new java.io.File(dir, s"shard=$s"); sub.mkdirs()
      (0 until 2).foreach { part =>
        val w = new java.io.PrintWriter(new java.io.File(sub, f"part-$part%05d.csv"))
        (0 until 10).foreach { i => w.println(s"${s + (i % 3) * 4},${1000L * i},sig,${i * 1.0}") }
        w.close()
      }
      // hidden/metadata files must be ignored
      new java.io.File(sub, "_committed").createNewFile()
    }
    val df = spark.read.format("graft-sharded").load(dir.getAbsolutePath)
    assert(df.count() === 80)
    assert(df.rdd.getNumPartitions === 4) // one partition per shard, parts chained
    withBucketing {
      val agg = spark.read.format("graft-sharded").load(dir.getAbsolutePath)
        .groupBy("shard", "token_id")
        .agg(org.apache.spark.sql.functions.count("*").as("n"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(!plan.contains("Exchange"), s"dir layout must keep the key grouping:\n$plan")
    }
  }

  test("aggregate pushdown: per-token count/min/max computed inside the scan") {
    val dir = writeShards(4, 50)
    val df = spark.read.format("graft-sharded").load(dir)
    val q = df.groupBy("token_id")
      .agg(org.apache.spark.sql.functions.count("*").as("n"),
        org.apache.spark.sql.functions.min("ts_us").as("min_ts"),
        org.apache.spark.sql.functions.max("v").as("max_v"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAgg=[groups=token_id aggs=count_star(),min(ts_us),max(v)]"),
      s"aggregation must reach the scan:\n$plan")
    // values must equal the unpushed computation (distinct plan shapes)
    val pushed = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    val plain = df.selectExpr("token_id", "ts_us", "v").collect()
      .groupBy(_.getLong(0)).map { case (t, rows) =>
        (t, rows.length.toLong, rows.map(_.getLong(1)).min, rows.map(_.getDouble(2)).max)
      }.toArray.sortBy(_._1)
    assert(pushed.toSeq === plain.toSeq)
  }

  test("aggregate pushdown: DISTINCT token_id is a pushed group-by") {
    val dir = writeShards(4, 50)
    val df = spark.read.format("graft-sharded").load(dir)
    val q = df.select("token_id").distinct()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAgg=[groups=token_id aggs=]"),
      s"DISTINCT must reach the scan:\n$plan")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq ===
      df.collect().map(_.getLong(1)).distinct.sorted.toSeq)
  }

  test("grouping on the clustering column declines pushdown, keeps zero-exchange") {
    // pushed-partial + exchange loses to complete-without-exchange: the
    // builder must NOT push when `shard` is in the grouping (the rewrite's
    // group-col aliasing would break KeyGroupedPartitioning propagation)
    val dir = writeShards(4, 50)
    withBucketing {
      val q = spark.read.format("graft-sharded").load(dir)
        .groupBy("shard", "token_id")
        .agg(org.apache.spark.sql.functions.count("*").as("n"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(!plan.contains("pushedAgg"), plan)
      assert(!plan.contains("Exchange"),
        s"key grouping must still elide the shuffle:\n$plan")
      assert(q.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0) === 200)
    }
  }

  test("non-pushable aggregates leave the scan untouched (avg stays Spark-side)") {
    val dir = writeShards(4, 30)
    val q = spark.read.format("graft-sharded").load(dir)
      .groupBy("token_id").agg(org.apache.spark.sql.functions.avg("v").as("av"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("pushedAgg"), plan)
    assert(q.count() > 0)
  }

  test("aggregate pushdown: sum ships per-shard partials; int widens; all-null sums stay null") {
    import org.apache.spark.sql.functions.{count => fcount, sum => fsum}
    // fixture with NULL values: token 12 gets ONLY empty v fields
    val dir = Files.createTempDirectory("graft-sharded-sum").toFile
    (0 until 2).foreach { s =>
      val w = new java.io.PrintWriter(new java.io.File(dir, s"shard=$s.csv"))
      (0 until 30).foreach { i =>
        val tok = s + (i % 3) * 2
        val v = if (tok == 4) "" else s"${i * 0.25}"
        w.println(s"$tok,${1000L * i},sig_${i % 2},$v")
      }
      // token 12: appears once per shard, v always null
      w.println(s"12,999,sig_x,")
      w.close()
    }
    val df = spark.read.format("graft-sharded").load(dir.getAbsolutePath)
    val raw = df.collect()
    val q = df.groupBy("token_id")
      .agg(fsum("v").as("sv"), fsum("ts_us").as("st"), fcount("*").as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("aggs=sum(v),sum(ts_us)"), s"sum must reach the scan:\n$plan")
    val got = q.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val exp = raw.groupBy(_.getLong(1)).map { case (t, rs) =>
      val vs = rs.filter(!_.isNullAt(4)).map(_.getDouble(4))
      (t, if (vs.isEmpty) None else Some(vs.sum), rs.map(_.getLong(2)).sum, rs.length.toLong)
    }.toArray.sortBy(_._1)
    assert(got.toSeq === exp.toSeq)
    // the all-null-v token's sum is null, not 0
    assert(got.find(_._1 == 12L).get._2 === None)
    // generic (string-key) path sums too
    val byName = df.groupBy("name").agg(fsum("v").as("sv"))
    assert(byName.queryExecution.executedPlan.toString.contains("aggs=sum(v)"))
    val gotN = byName.collect().map(r =>
      (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).sortBy(_._1)
    val expN = raw.groupBy(_.getString(3)).map { case (k, rs) =>
      val vs = rs.filter(!_.isNullAt(4)).map(_.getDouble(4))
      (k, if (vs.isEmpty) None else Some(vs.sum)) }.toArray.sortBy(_._1)
    assert(gotN.toSeq === expN.toSeq) // sig_x (the all-null-v name) stays None
  }

  test("double min/max/sum pushdown follows Spark's NaN total order on both paths") {
    // ADVICE r7: the fast path compared doubles with raw </>, returning a
    // non-NaN max where Spark (and the generic path) return NaN
    val dir = Files.createTempDirectory("graft-sharded-nan").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "shard=0.csv"))
    w.println("0,1000,sig,1.5")
    w.println("0,2000,sig,NaN")
    w.println("0,3000,sig,2.5")
    w.println("1,4000,sig,-0.0")
    w.println("1,5000,sig,0.0")
    w.close()
    import org.apache.spark.sql.functions.{max => fmax, min => fmin}
    // compare by raw BITS: tuple == treats NaN != NaN and -0.0 == 0.0,
    // hiding exactly the disagreements this test exists to catch
    def run(): Seq[(Long, Long, Long)] = {
      val q = spark.read.format("graft-sharded").load(dir.getAbsolutePath)
        .groupBy("token_id").agg(fmin("v").as("mn"), fmax("v").as("mx"))
      assert(q.queryExecution.executedPlan.toString.contains("pushedAgg="))
      q.collect().map(r => (r.getLong(0),
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).sortBy(_._1).toSeq
    }
    val fast = run()
    val generic =
      try { System.setProperty("graft.sharded.aggFastPath", "false"); run() }
      finally System.setProperty("graft.sharded.aggFastPath", "true")
    assert(fast === generic, "fast and generic paths must share one double ordering")
    val t0 = fast.find(_._1 == 0L).get
    assert(t0._2 === java.lang.Double.doubleToLongBits(1.5) &&
      java.lang.Double.longBitsToDouble(t0._3).isNaN,
      s"NaN is the max under Spark's order: $t0")
    // signed zero: Double.compare order keeps -0.0 as the min, 0.0 the max
    val t1 = fast.find(_._1 == 1L).get
    assert(t1._2 === java.lang.Double.doubleToLongBits(-0.0) &&
      t1._3 === java.lang.Double.doubleToLongBits(0.0), s"signed-zero order: $t1")
  }

  test("static-pushdown literals that do not round-trip stay Spark-side (no silent narrowing)") {
    // ADVICE r7: a Long shard literal beyond Int range must NOT push (it
    // would truncate to the wrong shard); an in-range Long still pushes
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan}
    import graft.sources.ShardRowPredicate
    assert(!ShardRowPredicate.supported(EqualTo("shard", java.lang.Long.valueOf(1L << 40))))
    assert(!ShardRowPredicate.supported(EqualTo("shard", java.lang.Double.valueOf(3.5))))
    assert(ShardRowPredicate.supported(EqualTo("shard", java.lang.Long.valueOf(3L))))
    assert(ShardRowPredicate.supported(EqualTo("token_id", java.lang.Integer.valueOf(7))))
    assert(!ShardRowPredicate.supported(EqualTo("token_id", java.lang.Double.valueOf(7.5))))
    assert(ShardRowPredicate.supported(GreaterThan("v", java.lang.Double.valueOf(1.25))))
    assert(ShardRowPredicate.supported(GreaterThan("v", java.lang.Integer.valueOf(2))))
  }

  test("v-range static pushdown is exact (residual-free) incl. NaN and signed zero") {
    val dir = Files.createTempDirectory("graft-sharded-vrange").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "shard=0.csv"))
    w.println("0,1000,sig,1.5")
    w.println("1,2000,sig,NaN")
    w.println("2,3000,sig,-0.0")
    w.println("3,4000,sig,0.0")
    w.println("4,5000,sig,")      // null v
    w.println("5,6000,sig,2.5")
    w.close()
    import org.apache.spark.sql.functions.col
    val df = spark.read.format("graft-sharded").load(dir.getAbsolutePath)
    def toks(q: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("pushedFilters=["), s"v predicate must push:\n$plan")
      assert(q.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
      }.isEmpty, s"must be residual-free:\n${q.queryExecution.optimizedPlan}")
      q.select("token_id").collect().map(_.getLong(0)).sorted.toSeq
    }
    // NaN is greater than everything (Spark's order): v > 2.0 keeps NaN
    assert(toks(df.where(col("v") > 2.0)) === Seq(1L, 5L))
    // -0.0 == 0.0 for SQL comparison: v = 0.0 keeps both zero rows
    assert(toks(df.where(col("v") === 0.0)) === Seq(2L, 3L))
    // range keeps the finite band (both zeros and 1.5), drops null and NaN
    assert(toks(df.where(col("v") >= 0.0 && col("v") <= 2.0)) === Seq(0L, 2L, 3L))
  }

  test("pushed aggregation: long-key fast path and generic path agree, nulls intact") {
    import org.apache.spark.sql.functions.{col, count => fcount, max => fmax, min => fmin}
    // fixture with NULL token_ids and NULL values mixed in
    val dir = Files.createTempDirectory("graft-sharded-nulls").toFile
    (0 until 2).foreach { s =>
      val w = new java.io.PrintWriter(new java.io.File(dir, s"shard=$s.csv"))
      (0 until 40).foreach { i =>
        val tok = if (i % 5 == 0) "" else s"${s + (i % 3) * 2}"
        val v = if (i % 7 == 0) "" else s"${i * 0.25}"
        w.println(s"$tok,${1000L * i},sig_${i % 2},$v")
      }
      w.close()
    }
    val df = spark.read.format("graft-sharded").load(dir.getAbsolutePath)
    val raw = df.collect()

    // long group key → the primitive fast path
    val byTok = df.groupBy("token_id")
      .agg(fcount("*").as("n"), fmin("ts_us").as("mn"), fmax("v").as("mx"))
    assert(byTok.queryExecution.executedPlan.toString.contains("pushedAgg=[groups=token_id"))
    val gotTok = byTok.collect().map(r => (
      if (r.isNullAt(0)) None else Some(r.getLong(0)),
      r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)))).sortBy(_._1.map(_.toString))
    val expTok = raw.groupBy(r => if (r.isNullAt(1)) None else Some(r.getLong(1)))
      .map { case (k, rs) => (k, rs.length.toLong, rs.map(_.getLong(2)).min,
        rs.filter(!_.isNullAt(4)).map(_.getDouble(4)) match {
          case e if e.isEmpty => None; case vs => Some(vs.max) })
      }.toArray.sortBy(_._1.map(_.toString))
    assert(gotTok.toSeq === expTok.toSeq)

    // string group key → the generic path, same contract
    val byName = df.groupBy("name").agg(fcount("*").as("n"), fmin("v").as("mn"))
    assert(byName.queryExecution.executedPlan.toString.contains("pushedAgg=[groups=name"))
    val gotName = byName.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val expName = raw.groupBy(_.getString(3)).map { case (k, rs) =>
      (k, rs.length.toLong, rs.filter(!_.isNullAt(4)).map(_.getDouble(4)).min)
    }.toArray.sortBy(_._1)
    assert(gotName.toSeq === expName.toSeq)
  }

  test("long-key fast path survives growth past the initial table capacity") {
    import org.apache.spark.sql.functions.{col, count => fcount, min => fmin}
    // > 4096 distinct tokens in one shard forces at least one rehash
    val dir = Files.createTempDirectory("graft-sharded-many").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "shard=0.csv"))
    (0 until 20000).foreach { i => w.println(s"${i % 7000},${100L * i},sig,${i * 1.0}") }
    w.close()
    val q = spark.read.format("graft-sharded").load(dir.getAbsolutePath)
      .groupBy("token_id").agg(fcount("*").as("n"), fmin("ts_us").as("mn"))
    assert(q.queryExecution.executedPlan.toString.contains("pushedAgg="))
    val got = q.collect()
    assert(got.length === 7000)
    assert(got.map(_.getLong(1)).sum === 20000L)
    // spot-check one group: token 0 appears at i = 0, 7000, 14000
    val t0 = got.find(_.getLong(0) == 0L).get
    assert(t0.getLong(1) === 3L && t0.getLong(2) === 0L)
  }

  test("topN on ts_us pushes into the scan: K-bounded per-shard output") {
    import org.apache.spark.sql.functions.col
    val dir = writeShards(4, 50)
    val df = spark.read.format("graft-sharded").load(dir)
    val k = 3
    val q = df.orderBy(col("ts_us").desc).limit(k)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains(s"topN=$k ts_us DESC"), s"TopN must reach the scan:\n$plan")
    // highest timestamps: i=49 across all 4 shards -> ts 49,000,000 x4; top-3
    val got = q.select("ts_us").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(49000000L, 49000000L, 49000000L))
    // each shard shipped <= K rows, not its 50
    val scan = findScan(q, "graft_sharded")
    assert(scan.metrics("numOutputRows").value <= 4L * k,
      s"scan emitted ${scan.metrics("numOutputRows").value} rows")
    // ascending works too and a non-ts sort is NOT pushed
    val qa = df.orderBy(col("ts_us").asc).limit(2)
    assert(qa.queryExecution.executedPlan.toString.contains("topN=2 ts_us ASC"))
    assert(qa.select("ts_us").collect().map(_.getLong(0)).toSeq === Seq(0L, 0L))
    val qn = df.orderBy(col("v").desc).limit(2)
    assert(!qn.queryExecution.executedPlan.toString.contains("topN="), "v-sort must not push")
    assert(qn.collect().length === 2)
  }

  test("runtime filtering prunes entire shards on a selective dim join") {
    val dir = writeShards(8, 50)
    withConfs(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10.0") {
      import org.apache.spark.sql.functions.col
      val fact = spark.read.format("graft-sharded").load(dir)
      val dim = spark.range(0, 8).select(col("id").cast("int").as("shard"))
        .where(col("shard") < 2)
      val j = fact.join(dim, Seq("shard"))
      assert(j.collect().length === 100) // shards 0,1 × 50 rows
      val planStr = j.queryExecution.executedPlan.toString
      assert(planStr.contains("RuntimeFilters: [dynamicpruning"),
        s"the dim join must inject a runtime filter into the scan:\n$planStr")
      val scan = findScan(j, "graft_sharded")
      // numOutputRows = 100 PROVES file-level pruning: the reader has no
      // row-level shard predicate, so the only way the scan emits exactly
      // the two surviving shards' rows is that the other six shard files
      // were never planned as partitions at all.
      assert(scan.metrics("numOutputRows").value === 100,
        s"scan emitted ${scan.metrics("numOutputRows").value} rows — shards not pruned")
    }
  }

  test("runtime filtering composes with the key-grouped (bucketing) path") {
    // DPP pruning re-plans partitions AFTER the KeyGroupedPartitioning is
    // declared — the combination must stay correct (Spark regroups the
    // filtered partitions). The join sits DIRECTLY over the scan (an
    // Aggregate in between would block PartitionPruning's
    // PhysicalOperation match and make this test vacuous); the per-shard
    // aggregation runs above the pruned join.
    val dir = writeShards(8, 50)
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10.0") {
      import org.apache.spark.sql.functions.{col, sum => fsum}
      val dim = spark.range(0, 8).select(col("id").cast("int").as("shard"))
        .where(col("shard") < 3)
      val j = spark.read.format("graft-sharded").load(dir)
        .join(dim, Seq("shard"))
        .groupBy("shard", "token_id").agg(fsum("v").as("sv"))
      val rows = j.collect()
      // the runtime filter actually fired...
      val planStr = j.queryExecution.executedPlan.toString
      assert(planStr.contains("RuntimeFilters: [dynamicpruning"),
        s"DPP must inject into the key-grouped scan:\n$planStr")
      // ...and pruned at file level (150 = 3 surviving shards x 50 rows;
      // the reader has no row-level shard predicate)
      val scan = findScan(j, "graft_sharded")
      assert(scan.metrics("numOutputRows").value === 150,
        s"scan emitted ${scan.metrics("numOutputRows").value} rows — shards not pruned")
      // shards 0,1,2 x 7 tokens each, values identical to the unpruned path
      assert(rows.length === 21, s"got ${rows.length} rows")
      assert(rows.forall(_.getInt(0) < 3))
      val full = spark.read.format("graft-sharded").load(dir)
        .where(col("shard") < 3)
        .groupBy("shard", "token_id").agg(fsum("v").as("sv"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet === full)
    }
  }

  test("static filter pushdown: shard equality prunes files; token/name/ts drop rows at parse time") {
    import org.apache.spark.sql.functions.col
    val dir = writeShards(8, 50)
    val df = spark.read.format("graft-sharded").load(dir)

    // shard = 3 → file-level prune: scan emits EXACTLY that shard's rows
    // (no Spark-side residual filter exists to hide over-reads)
    val qs = df.where(col("shard") === 3)
    val rows = qs.collect()
    assert(rows.length === 50 && rows.forall(_.getInt(0) === 3))
    val scan = findScan(qs, "graft_sharded")
    assert(scan.metrics("numOutputRows").value === 50,
      s"scan emitted ${scan.metrics("numOutputRows").value} — shard files not pruned")
    assert(scan.toString.contains("pushedFilters="), s"description must show the pushed filters:\n$scan")
    // residual-free: the conjuncts were consumed exactly, no Filter node remains
    assert(qs.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isEmpty, s"pushed filters must leave no residual:\n${qs.queryExecution.optimizedPlan}")

    // token_id = 3: parse-time row skip, values identical to Spark-side eval
    val qt = df.where(col("token_id") === 3L)
    val gotT = qt.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val expT = df.collect().filter(r => !r.isNullAt(1) && r.getLong(1) == 3L)
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(gotT === expT && gotT.nonEmpty)
    assert(findScan(qt, "graft_sharded").metrics("numOutputRows").value === gotT.length.toLong)

    // name IN + half-open ts range compose (conjuncts intersect)
    val qn = df.where(col("name").isin("sig_0", "sig_2") &&
      col("ts_us") >= 10000000L && col("ts_us") < 30000000L)
    val gotN = qn.collect().map(r => (r.getInt(0), r.getLong(2), r.getString(3))).sorted.toSeq
    val expN = df.collect()
      .filter(r => Set("sig_0", "sig_2")(r.getString(3)) && !r.isNullAt(2)
        && r.getLong(2) >= 10000000L && r.getLong(2) < 30000000L)
      .map(r => (r.getInt(0), r.getLong(2), r.getString(3))).sorted.toSeq
    assert(gotN === expN && gotN.nonEmpty)
    assert(findScan(qn, "graft_sharded").metrics("numOutputRows").value === gotN.length.toLong)

    // unsupported shapes stay Spark-side residuals (and stay correct) —
    // v ranges push since r8, so the residual example is a string prefix
    val qu = df.where(col("name").startsWith("sig"))
    assert(qu.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.nonEmpty, "an unsupported predicate must remain a residual Filter")
    assert(qu.count() === df.collect().count(r => r.getString(3).startsWith("sig")))
  }

  test("static filters compose with aggregate pushdown (filtered per-token fragment)") {
    import org.apache.spark.sql.functions.{col, count => fcount, min => fmin}
    val dir = writeShards(4, 50)
    val df = spark.read.format("graft-sharded").load(dir)
    val q = df.where(col("name") === "sig_1")
      .groupBy("token_id")
      .agg(fcount("*").as("n"), fmin("ts_us").as("min_ts"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAgg=[groups=token_id aggs=count_star(),min(ts_us)]"),
      s"filtered aggregate must still push:\n$plan")
    assert(plan.contains("pushedFilters=") && plan.contains("sig_1"),
      s"the filter must ride into the same scan:\n$plan")
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val exp = df.collect().filter(_.getString(3) == "sig_1")
      .groupBy(_.getLong(1)).map { case (t, rs) =>
        (t, rs.length.toLong, rs.map(_.getLong(2)).min)
      }.toSeq.sorted
    assert(got === exp && got.nonEmpty)
  }

  test("reported statistics: post-prune bytes drive the broadcast decision") {
    import org.apache.spark.sql.functions.col
    val dir = writeShards(8, 50)
    val df = spark.read.format("graft-sharded").load(dir)
    // the logical relation reports REAL bytes (not the never-broadcast
    // session default), and static shard pruning shrinks them
    val full = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val oneShard = df.where(col("shard") === 3).queryExecution.optimizedPlan.stats.sizeInBytes
    val onDisk = new java.io.File(dir).listFiles().map(_.length()).sum
    assert(full === BigInt(onDisk), s"stats must report file bytes: $full vs $onDisk")
    assert(oneShard * 4 < full, s"static prune must shrink stats: $oneShard vs $full")

    // a big synthetic fact joined to the small sharded dim: the planner
    // broadcasts the dim BECAUSE the scan reported its true (small) size
    val fact = spark.range(0, 5000).selectExpr("id % 56 as token_id", "id as x")
    val j = fact.join(df.select("token_id", "v"), Seq("token_id"))
    j.collect()
    val nodes = allExecNodes(j.queryExecution.executedPlan).map(_.getClass.getSimpleName)
    assert(nodes.exists(_.contains("BroadcastHashJoin")),
      s"small reported stats must yield BHJ, got:\n${nodes.mkString(", ")}")

    // negative control: with a floor threshold the same join must NOT BHJ
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "64",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "64") {
      val j2 = fact.join(df.select("token_id", "v"), Seq("token_id"))
      j2.collect()
      val n2 = allExecNodes(j2.queryExecution.executedPlan).map(_.getClass.getSimpleName)
      assert(!n2.exists(_.contains("BroadcastHashJoin")),
        s"tiny threshold must forbid BHJ, got:\n${n2.mkString(", ")}")
    }
  }

  test("malformed rows fail with file/line context; empty numerics map to null") {
    val dir = Files.createTempDirectory("graft-sharded-bad").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "shard=0.csv"))
    w.println("1,1000,sig_a,2.5")
    w.println(",,sig_b,") // empty numerics → null row values, not a crash
    w.println("7,2000,sig_c,oops") // non-numeric v → task failure with context
    w.close()
    val df = spark.read.format("graft-sharded").load(dir.getAbsolutePath)
    val e = intercept[Throwable] { df.collect() }
    val msg = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msg.contains("shard=0.csv") && msg.contains("non-numeric v")
      && msg.contains("oops"), s"error must carry file+line context, got: $msg")

    // without the poisoned line, the empty-numeric row honors the nullable schema
    val dir2 = Files.createTempDirectory("graft-sharded-null").toFile
    val w2 = new java.io.PrintWriter(new java.io.File(dir2, "shard=0.csv"))
    w2.println("1,1000,sig_a,2.5")
    w2.println(",,sig_b,")
    w2.close()
    val rows = spark.read.format("graft-sharded").load(dir2.getAbsolutePath)
      .orderBy("name").collect()
    assert(rows.length === 2)
    assert(!rows(0).isNullAt(1) && rows(0).getLong(1) === 1L)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) && rows(1).isNullAt(4))
    assert(rows(1).getString(3) === "sig_b")
  }

  test("storage-partitioned join: neither side shuffles") {
    val dirA = writeShards(4, 40)
    val dirB = writeShards(4, 20)
    // join keys (shard, token_id) ⊃ partition keys (shard): allowed once
    // co-partition stops requiring the exact key set; broadcast disabled so
    // the storage-partitioned path (not BHJ) is what's exercised
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val a = spark.read.format("graft-sharded").load(dirA)
        .groupBy("shard", "token_id").agg(org.apache.spark.sql.functions.sum("v").as("va"))
      val b = spark.read.format("graft-sharded").load(dirB)
        .groupBy("shard", "token_id").agg(org.apache.spark.sql.functions.sum("v").as("vb"))
      val j = a.join(b, Seq("shard", "token_id"))
      val rows = j.collect()
      assert(rows.nonEmpty)
      val plan = j.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(!plan.contains("Exchange"),
        s"same-layout datasets must storage-partition-join shuffle-free:\n$plan")
    }
  }

  test("within-shard split: non-key scans plan byte-range splits; key-grouped paths keep 1:1") {
    import org.apache.spark.sql.functions.col
    // 8 shards × 400 rows ≈ 10 KB per file; splitBytes=1 KB → ~10 splits/shard
    val dir = writeShards(8, 400)
    val df = spark.read.format("graft-sharded").option("splitBytes", "1024").load(dir)

    // shard pruned from the output → auto split: parallelism beyond NShards
    val raw = df.select("token_id", "v")
    val nRaw = raw.rdd.getNumPartitions
    assert(nRaw > 8, s"a non-key raw scan must split past the shard count, planned $nRaw")
    // identical results vs the unsplit read, wherever the byte boundaries land
    val never = spark.read.format("graft-sharded").option("split", "never").load(dir)
      .select("token_id", "v")
    assert(never.rdd.getNumPartitions === 8)
    def canon(q: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      q.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(x => (x._1, x._2)).toSeq
    assert(canon(raw) === canon(never))

    // shard in the output → auto keeps the key-grouped 1:1 contract
    assert(df.select("shard", "token_id").rdd.getNumPartitions === 8)
    // ...and the zero-exchange aggregation still holds under the option
    withBucketing {
      val agg = df.groupBy("shard", "token_id")
        .agg(org.apache.spark.sql.functions.count("*").as("n"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(!plan.contains("Exchange"),
        s"split=auto must not break the key-grouped zero-exchange plan:\n$plan")
    }

    // split=always forces splitting even with shard in the output
    val always = spark.read.format("graft-sharded")
      .option("split", "always").option("splitBytes", "1024").load(dir)
    assert(always.rdd.getNumPartitions > 8)
    assert(always.count() === 8L * 400)

    // pushed aggregate over splits: per-SPLIT partials merge exactly like
    // per-shard partials (partial-pushdown contract)
    val aggSplit = df.groupBy("token_id")
      .agg(org.apache.spark.sql.functions.count("*").as("n"),
        org.apache.spark.sql.functions.min("ts_us").as("mn"),
        org.apache.spark.sql.functions.sum("v").as("sv"))
    assert(aggSplit.queryExecution.executedPlan.toString.contains("pushedAgg="))
    val gotAgg = aggSplit.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    val expAgg = never.collect().groupBy(_.getLong(0)).map { case (t, rs) =>
      (t, rs.length.toLong, 0L, rs.map(_.getDouble(1)).sum) }.toArray.sortBy(_._1)
    assert(gotAgg.map(x => (x._1, x._2, x._4)).toSeq === expAgg.map(x => (x._1, x._2, x._4)).toSeq)

    // pushed TopN over splits: per-split K-heaps still yield the global top-K
    val top = df.select("ts_us").orderBy(col("ts_us").desc).limit(3)
    assert(top.queryExecution.executedPlan.toString.contains("topN=3"))
    // i=399 appears once per shard → the global top-3 is ts=399000000 ×3
    assert(top.collect().map(_.getLong(0)).toSeq ===
      Seq(399000000L, 399000000L, 399000000L))
  }

  test("runtime token filter drops non-matching rows at parse time") {
    import org.apache.spark.sql.functions.col
    val dir = writeShards(8, 50)
    withConfs(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10.0") {
      // the dim must keep a real Filter node (a pre-folded LocalRelation
      // fails DPP's selective-predicate check) and joins on token_id ONLY
      // — no shard to prune, so the win must come from row-level skipping
      val dim = spark.range(0, 60).select(col("id").as("token_id"))
        .where(col("token_id") === 9L)
      val fact = spark.read.format("graft-sharded").load(dir)
        .select("token_id", "ts_us", "v")
      val j = fact.join(dim, Seq("token_id"))
      val got = j.collect()
      // token 9 lives in shard 1 (9 % 8) and appears rowsPerShard/7-ish times
      assert(got.nonEmpty && got.forall(_.getLong(0) == 9L))
      val planStr = j.queryExecution.executedPlan.toString
      assert(planStr.contains("RuntimeFilters: [dynamicpruning"),
        s"the token join must inject a runtime filter into the scan:\n$planStr")
      val scan = findScan(j, "graft_sharded")
      assert(scan.metrics("numOutputRows").value === got.length.toLong,
        s"scan emitted ${scan.metrics("numOutputRows").value} rows — token rows only")
    }
  }

  test("predicateSkippedRows metric accounts for parse-time drops") {
    import org.apache.spark.sql.functions.col
    val dir = writeShards(2, 50) // 100 rows total
    // raw filtered scan: residual-free, so the ONLY place rows can drop is
    // the reader's parse-time skip — the metric must equal total - emitted
    val q = spark.read.format("graft-sharded").load(dir)
      .where(col("name") === "sig_1")
    val got = q.collect().length
    val scan = findScan(q, "graft_sharded")
    assert(scan.metrics("predicateSkippedRows").value === 100L - got,
      s"skip metric ${scan.metrics("predicateSkippedRows").value} vs ${100 - got}")
    // the pushed-aggregate path reports it too
    val qa = spark.read.format("graft-sharded").load(dir)
      .where(col("name") === "sig_1")
      .groupBy("token_id").agg(org.apache.spark.sql.functions.count("*").as("n"))
    qa.collect()
    val scanA = findScan(qa, "graft_sharded")
    assert(scanA.metrics("predicateSkippedRows").value === 100L - got)
  }

  test("global count(*) takes the newline-count path and agrees with the parsed path") {
    import org.apache.spark.sql.functions.{count, lit}
    // adversarial fixture: empty lines, CRLF endings, no trailing newline,
    // plus gz and zst parts — the count path must reproduce the parse
    // loop's skip-empty-lines rule byte-for-byte on all of them
    val dir = java.nio.file.Files.createTempDirectory("graft-cnt").toFile
    val w0 = new java.io.FileWriter(new java.io.File(dir, "shard=0.csv"))
    w0.write("1,1,a,1.0\n\n2,2,b,2.0\r\n\r\n3,3,c,3.0") // 3 rows, 2 empty, no trailing \n
    w0.close()
    val sub = new java.io.File(dir, "shard=1"); sub.mkdirs()
    val gz = new java.io.PrintWriter(new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(new java.io.File(sub, "part-0.csv.gz"))))
    (0 until 40).foreach(i => gz.println(s"${1 + 2 * i},${i}000,e,$i.5")) // shard 1: odd tokens
    gz.close()
    val zs = new java.io.PrintWriter(new com.github.luben.zstd.ZstdOutputStream(
      new java.io.FileOutputStream(new java.io.File(sub, "part-1.csv.zst"))))
    (0 until 25).foreach(i => zs.println(s"${1 + 2 * i},${i}000,z,$i.5"))
    zs.close()

    def run(): Long = spark.read.format("graft-sharded").load(dir.getAbsolutePath)
      .agg(count(lit(1)).as("n")).collect()(0).getLong(0)
    def runSplit(): Long = spark.read.format("graft-sharded")
      .option("split", "always").option("splitBytes", "16").load(dir.getAbsolutePath)
      .agg(count(lit(1)).as("n")).collect()(0).getLong(0)

    assert(run() === 68L)
    assert(runSplit() === 68L)
    // bit-identical to the parsed path
    System.setProperty("graft.sharded.countFastPath", "false")
    try {
      assert(run() === 68L)
      assert(runSplit() === 68L)
    } finally System.setProperty("graft.sharded.countFastPath", "true")
    // a static shard predicate prunes files, count path still eligible
    val one = spark.read.format("graft-sharded").load(dir.getAbsolutePath)
      .where(org.apache.spark.sql.functions.col("shard") === 1)
      .agg(count(lit(1)).as("n")).collect()(0).getLong(0)
    assert(one === 65L)
    // a ROW-level predicate disqualifies it (fields must be parsed) and
    // results still agree
    val filtered = spark.read.format("graft-sharded").load(dir.getAbsolutePath)
      .where(org.apache.spark.sql.functions.col("name") === "e")
      .agg(count(lit(1)).as("n")).collect()(0).getLong(0)
    assert(filtered === 40L)
  }

  test("oversized runtime IN-sets are ignored (advisory contract, bounded task payloads)") {
    import graft.sources.{BroadcastTokens, InlineTokens, ShardedScan, ShardedScanBuilder, ShardPartition, ShardedSignalSource}
    import org.apache.spark.sql.sources.In
    val dir = writeShards(2, 10)
    def partitions(filterVals: Array[Any]) = {
      val scan = new ShardedScanBuilder(dir).build().asInstanceOf[ShardedScan]
      scan.filter(Array[org.apache.spark.sql.sources.Filter](In("token_id", filterVals)))
      scan.planInputPartitions().map(_.asInstanceOf[ShardPartition])
    }
    // a small set rides into every partition, inline and sorted
    val small = partitions(Array[Any](java.lang.Long.valueOf(3L)))
    assert(small.forall(_.tokens.exists {
      case InlineTokens(arr) => arr.toSeq == Seq(3L)
      case _ => false
    }))
    // beyond the cap the scan stays unfiltered — the join above still
    // applies the predicate; task launch stays bounded
    val big = partitions(
      Array.tabulate[Any](ShardedSignalSource.MaxRuntimeInSet + 1)(i => java.lang.Long.valueOf(i.toLong)))
    assert(big.forall(_.tokens.isEmpty))
  }

  test("large runtime IN-sets broadcast once: partition payload is a handle, not the set") {
    // ADVICE r8: a ~1M-token Set[Long] used to EMBED in every planned
    // partition — with byte-range splits, set-size × partition-count task
    // launch payload. Above the inline threshold the scan broadcasts the
    // sorted array once; each partition serializes to a few hundred bytes.
    import graft.sources.{BroadcastTokens, ShardedScan, ShardedScanBuilder, ShardPartition, ShardedSignalSource}
    import org.apache.spark.sql.sources.In
    val dir = writeShards(2, 10)
    val n = ShardedSignalSource.InlineRuntimeTokens * 4
    // evens only: the carrier must actually DROP the odd tokens
    val scan = new ShardedScanBuilder(dir).build().asInstanceOf[ShardedScan]
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      In("token_id", Array.tabulate[Any](n)(i => java.lang.Long.valueOf(2L * i)))))
    val parts = scan.planInputPartitions().map(_.asInstanceOf[ShardPartition])
    assert(parts.nonEmpty)
    assert(parts.forall(_.tokens.exists(_.isInstanceOf[BroadcastTokens])))
    parts.foreach { p =>
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(p); oos.close()
      assert(bos.size() < 16 * 1024,
        s"partition payload ${bos.size()} B must not embed the $n-token set")
    }
    // and the filtered read through the carrier is still exact
    val expect = spark.read.format("graft-sharded").load(dir)
      .where(org.apache.spark.sql.functions.expr(s"token_id % 2 = 0 AND token_id < ${2L * n}"))
      .count()
    val rows = parts.flatMap { p =>
      val r = new graft.sources.ShardedReaderFactory(
        graft.sources.ShardedSignalSource.Schema).createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (r.next()) buf += r.get().getLong(1)
      r.close(); buf
    }
    assert(rows.length.toLong === expect && expect > 0)
    assert(rows.forall(t => t % 2 == 0))
  }

  test("bare LIMIT pushes: each partition early-stops after K accepted rows") {
    import org.apache.spark.sql.functions.col
    val dir = writeShards(4, 50)
    val df = spark.read.format("graft-sharded").load(dir)
    val q = df.limit(3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("limit=3"), s"bare limit must reach the scan:\n$plan")
    assert(q.collect().length === 3)
    // the scan ships at most K per planned partition, not the corpus
    val scan = findScan(q, "graft_sharded")
    assert(scan.metrics("numOutputRows").value <= 3L * 4,
      s"scan emitted ${scan.metrics("numOutputRows").value} rows")
    // limit composes with a pushed filter: the K accepted rows all match
    val qf = df.where(col("name") === "sig_1").limit(2)
    assert(qf.queryExecution.executedPlan.toString.contains("limit=2"))
    val rows = qf.collect()
    assert(rows.length === 2 && rows.forall(_.getString(3) == "sig_1"))
    // ...but never under a pushed aggregate (declined, stays correct)
    val qa = df.groupBy("token_id").agg(org.apache.spark.sql.functions.count("*").as("n")).limit(2)
    assert(qa.collect().length === 2)
  }

  test("split results are boundary-invariant across split widths") {
    // property-style sweep: any splitBytes must yield the identical row
    // multiset (the ByteRangeLines ownership convention leaves no line
    // lost or duplicated wherever the boundary lands)
    val dir = writeShards(3, 120)
    def canon(bytes: Long): Seq[(Long, Long, String, Double)] =
      spark.read.format("graft-sharded")
        .option("split", "always").option("splitBytes", bytes.toString).load(dir)
        .select("token_id", "ts_us", "name", "v")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
        .sortBy(x => (x._1, x._2, x._3)).toSeq
    val reference = spark.read.format("graft-sharded")
      .option("split", "never").load(dir)
      .select("token_id", "ts_us", "name", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2, x._3)).toSeq
    // widths straddling every interesting boundary: mid-line, line-aligned,
    // sub-line, larger than the file
    for (b <- Seq(1L, 7L, 64L, 100L, 1021L, 4096L, 1L << 20)) {
      assert(canon(b) === reference, s"splitBytes=$b must not change results")
    }
  }

  test("byte-level parse matches String parse on exotic numeric forms") {
    // the fast path covers plain digit runs; everything else must take
    // the String fallback and land BIT-identically to toLong/toDouble
    val dir = Files.createTempDirectory("graft-sharded-exotic").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "shard=0.csv"))
    w.println("1,1000,a,1e3")                      // exponent
    w.println("2,2000,b,NaN")                      // not-a-number
    w.println("3,3000,c,Infinity")                 // infinity
    w.println("4,4000,d,-2.5E-2")                  // signed exponent
    w.println("5,5000,e,.5")                       // no integer part
    w.println("6,6000,f,12.")                      // no fraction digits
    w.println("7,7000,g,-0.0")                     // signed zero
    w.println("8,8000,h,0.30000000000000004")      // 17 significant digits
    w.println("+9,9000,i,1.0")                     // plus-signed long (toLong accepts)
    w.println("1234567890123456789,9500,j,2.0")    // 19-digit long
    w.close()
    val rows = spark.read.format("graft-sharded").load(dir.getAbsolutePath)
      .orderBy("name").collect()
    val expectV = Seq("1e3", "NaN", "Infinity", "-2.5E-2", ".5", "12.", "-0.0",
      "0.30000000000000004").map(_.toDouble)
    rows.take(8).zip(expectV).foreach { case (r, e) =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ===
        java.lang.Double.doubleToLongBits(e), s"row ${r.getString(3)}")
    }
    assert(rows(8).getLong(1) === 9L, "'+9' parses via the String fallback")
    assert(rows(9).getLong(1) === 1234567890123456789L, "19-digit longs parse")
  }

  test("gzip and zstd part files decode transparently and are never byte-range split") {
    import org.apache.spark.sql.functions.col
    def gzWrite(f: java.io.File, lines: Seq[String]): Unit = {
      val out = new java.io.PrintWriter(new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(f)))
      lines.foreach(out.println)
      out.close()
    }
    def mkLines(shard: Int, n: Int): Seq[String] =
      (0 until n).map(i => s"${shard + (i % 5) * 4},${1000L * i},sig_${i % 3},${i * 0.5}")

    // flat .csv.gz fixtures next to a plain twin: identical reads
    val dir = Files.createTempDirectory("graft-sharded-gz").toFile
    gzWrite(new java.io.File(dir, "shard=0.csv.gz"), mkLines(0, 300))
    // shard 1: a DIRECTORY with one plain and one gz part (mixed codecs)
    val sub = new java.io.File(dir, "shard=1"); sub.mkdirs()
    // plain part kept under the 1 KB split width used below, so the ONLY
    // multi-partition question is whether gz files stay whole
    val wp = new java.io.PrintWriter(new java.io.File(sub, "part-0.csv"))
    mkLines(1, 30).foreach(wp.println); wp.close()
    gzWrite(new java.io.File(sub, "part-1.csv.gz"), mkLines(1, 200).map(_ + "1")) // distinct v
    // shard 2: a flat zstd fixture (Spark's modern default codec)
    val zOut = new java.io.PrintWriter(new com.github.luben.zstd.ZstdOutputStream(
      new java.io.FileOutputStream(new java.io.File(dir, "shard=2.csv.zst"))))
    mkLines(2, 150).foreach(zOut.println); zOut.close()
    val df = spark.read.format("graft-sharded").load(dir.getAbsolutePath)
    assert(df.count() === 680)
    assert(df.where(col("shard") === 0).count() === 300)
    assert(df.where(col("shard") === 2).count() === 150)

    // key-grouped aggregation still zero-exchange over gz parts
    withBucketing {
      val agg = df.groupBy("shard", "token_id")
        .agg(org.apache.spark.sql.functions.count("*").as("n"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(!plan.contains("Exchange"), plan)
    }

    // split=always must NOT split the compressed files (non-splittable
    // codecs): 4 part files -> exactly 4 partitions even at a 1 KB width
    val always = spark.read.format("graft-sharded")
      .option("split", "always").option("splitBytes", "1024").load(dir.getAbsolutePath)
    assert(always.rdd.getNumPartitions === 4,
      s"compressed parts must stay whole, planned ${always.rdd.getNumPartitions}")
    assert(always.count() === 680)
  }

  test("layout fingerprint is file-metadata-based and invalidates on rewrite") {
    // r7 verdict Next #3: fingerprint by (path, size, mtime) of the events
    // parquet parts — no corpus aggregate on the query path — while a
    // regenerated dataset (same basename, same row count) still changes it
    val d = Files.createTempDirectory("graft-fp").toFile
    val ev = new java.io.File(d, "events.parquet"); ev.mkdirs()
    val part = new java.io.File(ev, "part-00000.parquet")
    val w = new java.io.FileOutputStream(part); w.write("AAAA".getBytes); w.close()
    val fp1 = graft.queries.ShardedQueries.eventsFingerprint(d.getAbsolutePath)
    // same content, same size, same mtime → same fingerprint
    assert(graft.queries.ShardedQueries.eventsFingerprint(d.getAbsolutePath) === fp1)
    // size change → new fingerprint
    val w2 = new java.io.FileOutputStream(part); w2.write("BBBBBB".getBytes); w2.close()
    val fp2 = graft.queries.ShardedQueries.eventsFingerprint(d.getAbsolutePath)
    assert(fp2 !== fp1, "a rewritten part (different size) must invalidate")
    // same size, different mtime → new fingerprint (regeneration signature)
    part.setLastModified(part.lastModified() + 97000)
    val fp3 = graft.queries.ShardedQueries.eventsFingerprint(d.getAbsolutePath)
    assert(fp3 !== fp2, "a same-size rewrite (new mtime) must invalidate")
  }
}
