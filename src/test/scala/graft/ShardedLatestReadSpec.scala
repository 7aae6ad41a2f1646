package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `dedup=latest` — the query-time ReplacingMergeTree read: for every
  * (token_id, name), the newest-`ts_us` row, collapsed in one streaming
  * pass over the sorted K-way merge (state = one token's name→row map).
  * Pinned here: window-function equivalence (nulls included), replacing-key
  * predicate pushdown vs version-column residuals (a pushed version filter
  * would RESURRECT older rows), column pruning, and the agg/TopN decline.
  */
class ShardedLatestReadSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("token_id", LongType, nullable = true),
    StructField("ts_us", LongType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  /** Multi-part store with overwrite churn: 3 generations per (token,
    * name), interleaved across parts, plus null token / null ts / null
    * name groups.
    */
  private def writeStore(): String = {
    val dir = Files.createTempDirectory("graft-latest").toFile.getAbsolutePath
    def gen(g: Int): DataFrame = {
      val rows = (for {
        t <- 0L until 12L
        n <- Seq("speed", "soc")
      } yield Row((t % 3).toInt, t, 1000L * g + t, n, g * 10.0 + t)) ++ Seq(
        Row(0, null, 500L + g, "speed", g * 1.0), // null token group
        Row(1, 7L, null, "odo", g * 2.0),         // null ts: never beats a real ts
        Row(2, 5L, 2000L + g, null, g * 3.0))     // null name group
      spark.createDataFrame(spark.sparkContext.parallelize(
        scala.util.Random.shuffle(rows.toVector), 4), schema)
    }
    (0 until 3).foreach(g => gen(g).write.format("graft-sharded").mode("append").save(dir))
    (0 until 3).foreach { k =>
      assert(new java.io.File(dir, s"shard=$k").listFiles()
        .count(f => f.isFile && !f.getName.startsWith(".")) >= 3, "need multi-part merge")
    }
    dir
  }

  private def latest(dir: String): DataFrame = spark.read.format("graft-sharded")
    .option("sorted", "true").option("dedup", "latest").load(dir)

  test("snapshot ≡ window-function latest per (token_id, name), nulls as their own groups") {
    val dir = writeStore()
    val snap = latest(dir)
    val expect = spark.read.format("graft-sharded").load(dir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("token_id", "name")
          .orderBy(col("ts_us").desc_nulls_last)))
      .where(col("rn") === 1).drop("rn")
    // v compares only where the version is unambiguous (non-null ts —
    // distinct per group here); the all-null-ts group's tie-winner is
    // ingest-order semantics a window can't express (OrderedScanSpec pins
    // that tie-break directly)
    def proj(df: DataFrame): DataFrame = df.select(col("shard"), col("token_id"),
      col("name"), col("ts_us"), when(col("ts_us").isNotNull, col("v")).as("v"))
    val a = proj(snap)
    val b = proj(expect)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    assert(snap.count() === (12 * 2 + 3))
    // latest generation won everywhere (gen 2 wrote v = 20 + t for real keys)
    assert(snap.where("token_id IS NOT NULL AND name IN ('speed','soc') AND v < 20.0")
      .count() === 0)
  }

  test("replacing-key predicates push and drop whole groups; version predicates stay residual") {
    val dir = writeStore()
    // key predicate: filtering groups before or after the collapse is
    // identical, so it pushes into the scan
    val one = latest(dir).where(col("token_id") === 5L)
    assert(one.queryExecution.executedPlan.toString.contains("pushedFilters="),
      one.queryExecution.executedPlan.toString)
    assert(one.count() === 3) // speed, soc, null-name group

    // version predicate: must filter the SNAPSHOT, not the history — an
    // old row under the cutoff must NOT resurrect
    val cut = latest(dir).where(col("ts_us") < 2000L)
    val plan = cut.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), s"ts predicate must stay a residual:\n$plan")
    // every (token,name) has its latest at ts >= 2000 (gen 2) except the
    // null-token (ts 502) and null-ts groups — old generations stay dead
    assert(cut.where("token_id IS NOT NULL AND ts_us >= 1000").count() === 0,
      "a filtered snapshot must never contain a non-latest row")
    assert(cut.count() === 1) // the null-token group's latest (ts=502)
  }

  test("column pruning composes; aggregates and TopN are declined under dedup") {
    val dir = writeStore()
    val names = latest(dir).select("name")
    assert(names.count() === 27)

    val agg = latest(dir).groupBy("token_id").agg(count(lit(1)).as("n"))
    val aplan = agg.queryExecution.executedPlan.toString
    assert(!aplan.contains("pushedAgg"), s"agg must not push under dedup:\n$aplan")
    // per real token: speed + soc (+ odo for t=7, + null-name for t=5)
    assert(agg.where("token_id = 7").collect()(0).getLong(1) === 3)

    val top = latest(dir).orderBy(col("ts_us").desc).limit(3)
    assert(!top.queryExecution.executedPlan.toString.contains("topN="))
    assert(top.count() === 3)
  }
}
