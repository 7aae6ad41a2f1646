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
}
