package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-range (interval) join — another operator Spark lacks natively.
  * A naive `a.join(b, key && abs(aTs - bTs) <= w)` plans a per-key
  * nested-loop: quadratic in each key's row count. The scalable
  * formulation buckets time into `window`-sized cells, replicates the LEFT
  * side into its cell and both neighbors, equi-joins on (key, cell) — so
  * each row only meets rows at most one cell away — then applies the exact
  * range predicate. Cost: 3× left-side replication for an equi-join
  * shuffle, instead of a key-wide cross product.
  */
object RangeJoin {

  /** Pairs (l, r) sharing `keyCol` with |lTime − rTime| ≤ `windowMicros`.
    * Both time columns must be microsecond epoch longs (use
    * `unix_micros(ts)`). Column name collisions must be pre-resolved.
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeUs: String,
      rightTimeUs: String,
      windowMicros: Long
  ): DataFrame = {
    val cell = floor(col(rightTimeUs) / windowMicros)
    val r = right.withColumn("__cell", cell.cast("long"))
    val l = left
      .withColumn("__cell0", floor(col(leftTimeUs) / windowMicros).cast("long"))
      .withColumn("__cell", explode(array(col("__cell0") - 1, col("__cell0"), col("__cell0") + 1)))
      .drop("__cell0")
    l.join(r, Seq(keyCol, "__cell"))
      .where(abs(col(leftTimeUs) - col(rightTimeUs)) <= windowMicros)
      .drop("__cell")
  }
}
