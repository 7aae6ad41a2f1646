package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver's deterministic parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's TimestampType
      // (µs) cannot represent: read the raw int64 nanos and truncate to
      // microseconds — same semantics as DuckDB's TIMESTAMP_NS→TIMESTAMP
      // cast, so oracles stay comparable. Integer `div`, not `/`: ~1.7e18
      // ns exceeds the 2^53 exact-double range.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read
        .parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so queries can be written in SQL —
    * the declarative form Catalyst optimizes best.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
