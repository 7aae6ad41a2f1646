package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The identity dimension: subject ⇄ tokenId.
  *
  * The reference resolves this per-vehicle over gRPC with a 24h in-process
  * memo cache and negative caching
  * (`internal/service/deviceapi/service.go:52-105`, cache `:45,62-70`). In
  * Spark the remote dimension is snapshotted once up front and broadcast —
  * a broadcast hash join replaces the RPC + cache + negative-cache trio;
  * unmatched subjects surface as nulls of a left-outer join instead of
  * cached NotFound entries.
  */
object DeviceDim {

  /** Canonical dim schema: (tokenId: Long, subject: String). */
  def fromPairs(spark: SparkSession, pairs: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("tokenId", "subject")
  }

  /** Test/dev identity bijection used by the reference suite
    * (`sync_test.go:53-62`): subject == tokenId as string.
    */
  def identityDim(spark: SparkSession, tokens: Seq[Long]): DataFrame =
    fromPairs(spark, tokens.map(t => (t, t.toString)))

  /** Load a dimension SNAPSHOT dumped by the upstream identity service —
    * the RPC→DataFrame seam the reference fills with per-vehicle gRPC
    * calls + a 24 h memo cache (`deviceapi/service.go:52-105`). At cluster
    * scale the remote dimension is exported once per run (NDJSON of
    * `{"tokenId": N, "subject": "s"}` — any upstream exporter or a tiny
    * fetcher loop can produce it) and broadcast; rows missing either field
    * are dropped (the NotFound analog), duplicate subjects keep the
    * smallest tokenId so the join stays unambiguous.
    */
  def fromSnapshot(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.read
      .schema(StructType(Seq(
        StructField("tokenId", LongType),
        StructField("subject", StringType))))
      .option("mode", "PERMISSIVE")
      .json(path)
      .where(col("tokenId").isNotNull && col("subject").isNotNull)
      .groupBy(col("subject"))
      .agg(min(col("tokenId")).as("tokenId"))
      .select("tokenId", "subject")
  }

  /** Attach tokenId to converted signals via broadcast join on subject.
    * Inner join drops subjects unknown to the dim — the analog of the
    * reference skipping NotFound devices (`deviceapi/service.go:62-70`).
    */
  def attachTokenId(signals: DataFrame, dim: DataFrame): DataFrame =
    signals
      .join(broadcast(dim.select("tokenId", "subject")), Seq("subject"), "inner")
      .select("tokenId", "timestamp", "name", "valueNumber", "valueString", "source")
}
