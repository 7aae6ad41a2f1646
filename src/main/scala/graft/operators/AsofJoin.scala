package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal nearest-prior) join — an operator Spark lacks natively.
  *
  * Composed Spark-first instead of a custom SparkPlan: interleave both
  * sides into one stream keyed by (key, time), then a `last(_, ignoreNulls)`
  * running window carries the most recent right-side row forward onto each
  * left row. Cost profile: ONE shuffle on the key (same as any equi-join)
  * and a linear per-partition scan — no range-explosion, no per-row binary
  * search, works at any history length per key. A naive
  * `left.join(right, key && lTime >= rTime)` + max() would be quadratic per
  * key; this is the 100 TB-safe formulation.
  *
  * Tie semantics: a right row at exactly the left row's timestamp matches
  * (inclusive / backward-looking), mirroring `ASOF JOIN ... ON l.t >= r.t`.
  */
object AsofJoin {

  /** Left rows gain the latest right-side `rightTime` value at-or-before
    * their `leftTime`, per `keyCol`. Output = left columns + `rightTime`
    * column (null when no prior right row exists).
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTime: String,
      rightTime: String
  ): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    // side=0 orders right rows before left rows at equal timestamps so an
    // exact-time match is visible to the left row (>= semantics).
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__rt", lit(null).cast(left.schema(leftTime).dataType))
    val r = right.withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
      .withColumn("__rt", col(rightTime))
    val unioned = l.select((leftCols.map(col) :+ col("__t") :+ col("__side") :+ col("__rt")): _*)
      .unionByName(
        r.select((leftCols.map(c => if (c == keyCol) col(c) else lit(null).cast(left.schema(c).dataType).as(c))
          :+ col("__t") :+ col("__side") :+ col("__rt")): _*)
      )
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(rightTime, last(col("__rt"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select((leftCols.map(col) :+ col(rightTime)): _*)
  }
}
