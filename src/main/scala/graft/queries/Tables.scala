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
      // events.ts encoding has varied across driver testdata generations:
      // TIMESTAMP(NANOS) (int64 ns — which Spark's µs TimestampType cannot
      // represent directly) vs TIMESTAMP(MICROS) without timezone (read as
      // TIMESTAMP_NTZ). Normalize both to TimestampType: the session
      // timezone is pinned UTC everywhere (GraftSession/Verify/Bench), so
      // NTZ→timestamp is instant-preserving and matches DuckDB's naive
      // TIMESTAMP semantics. For nanos, integer `div`, not `/`: ~1.7e18 ns
      // exceeds the 2^53 exact-double range.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType => raw
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case other =>
          // Fail fast on any new encoding: a silent cast (e.g. from string
          // or double) would yield nulls and corrupt every events oracle.
          throw new IllegalStateException(
            s"events.ts has unexpected parquet type $other; " +
              "extend Tables.load with an explicit instant-preserving conversion")
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so queries can be written in SQL —
    * the declarative form Catalyst optimizes best.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
