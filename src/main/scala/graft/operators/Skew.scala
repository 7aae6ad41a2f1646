package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the 100 TB posture when AQE's runtime
  * skew-join splitting isn't enough (e.g. a single token_id holding 10% of
  * all telemetry, or one user dominating an event stream).
  *
  * Salting is deterministic here (salt = hash of non-key columns mod
  * buckets), so results are reproducible run-to-run and testable against
  * the unsalted formulation.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from the row's columns. */
  def saltColumn(cols: Seq[Column], buckets: Int): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Two-phase salted aggregation: partial sum/count per (key, salt) —
    * spreading a hot key over `buckets` reducers — then the final combine
    * per key. Produces exactly `sum(valueCol)` (DECIMAL-exact, order-free)
    * and `count(*)` per key.
    */
  def saltedSumCount(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      buckets: Int
  ): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val salted = df.withColumn(
      "__salt",
      saltColumn(df.columns.filter(_ != keyCol).map(col).toSeq, buckets)
    )
    salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol).cast(dec)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("__psum")).cast(org.apache.spark.sql.types.DoubleType).as("total"),
        sum(col("__pcnt")).as("n")
      )
  }

  /** Null-safe equi-join (`<=>` semantics) with a NULL-key skew guard.
    *
    * A plain `<=>` join hashes every null-keyed row to ONE reducer — and
    * null is routinely the single hottest "value" of an extracted key
    * (e.g. a JSON path most documents lack), so at scale the null bucket
    * is a guaranteed straggler. Null matches only null, so the join splits
    * losslessly:
    *   - non-null keys: ordinary equi-join (hash-partitioned, skew-free
    *     as far as real values allow);
    *   - null keys: every null-keyed left row pairs with the right side's
    *     null-keyed rows — a broadcast of that (by construction tiny,
    *     usually 1-row-per-aggregate) slice, never a shuffle hotspot.
    * Result ≡ `left.join(right, left(k) <=> right(k))` with the right key
    * column dropped.
    */
  def nullSafeJoinSkewGuarded(
      left: DataFrame,
      right: DataFrame,
      key: String
  ): DataFrame = {
    val rightRenamed = right.withColumnRenamed(key, "__rk")
    val nonNull = left
      .where(col(key).isNotNull)
      .join(rightRenamed.where(col("__rk").isNotNull), col(key) === col("__rk"))
    val nulls = left
      .where(col(key).isNull)
      .crossJoin(broadcast(rightRenamed.where(col("__rk").isNull)))
    nonNull.union(nulls).drop("__rk")
  }

  /** Salted equi-join for a skewed fact side: the fact takes a
    * deterministic salt, the (small-ish but above-broadcast-threshold) dim
    * side is replicated once per salt bucket, and the join key becomes
    * (key, salt) — splitting each hot key's rows across `buckets` tasks.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      buckets: Int
  ): DataFrame = {
    val saltedFact = fact.withColumn(
      "__salt",
      saltColumn(fact.columns.filter(_ != key).map(col).toSeq, buckets)
    )
    val replicatedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
