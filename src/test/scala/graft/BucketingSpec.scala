package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables: pre-shuffling both sides into the
  * same bucket layout removes the per-query Exchange — at 100 TB the
  * difference between re-shuffling the fact table every join and reading
  * co-partitioned buckets. Asserts the exchange-free plan, not just the
  * result.
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed fact-dim join plans without a shuffle on the join key") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")

    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")

    // Disable broadcast so the join would otherwise need a full shuffle.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle\n" + plan)
      assert(j.count() === orders.join(cust, col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
