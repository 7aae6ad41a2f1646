package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton-curve) file layout: the multi-dimensional clustering
  * write a 100 TB lakehouse runs so parquet footer min/max stats can skip
  * files on EITHER of two join/filter columns. A single-column sort makes
  * one dimension's per-file span tight and leaves the other at 100% of the
  * domain; interleaving the dimensions' bits makes both spans shrink like
  * sqrt(file fraction).
  *
  * Scale shape: the z-value is pure per-row integer bit arithmetic
  * (codegen'd, shuffle-free); the layout itself is ONE range-partitioned
  * shuffle on the z-key (`repartitionByRange` — distributed sort, no
  * single-task funnel) plus a partition-local sort. This is the write-side
  * complement of q127, which pins the same key math against the DuckDB
  * oracle.
  *
  * Reference context: the reference engine's index layout lives inside
  * Elasticsearch/ClickHouse (`internal/service/clickhouse/clickhouse.go`
  * MergeTree ORDER BY); on a data lake the equivalent physical-design
  * lever is the file sort order, which is what this job controls.
  */
object ZOrderLayout {

  /** Spread the low 16 bits of `c` to the even bit positions of a 32-bit
    * value — the classic 4-step mask/shift sequence. Pure `Column`
    * arithmetic so Catalyst codegens it and any ANSI engine replays it.
    */
  def spreadBits(c: Column): Column = {
    val a = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value of two dimensions quantized to 16 bits each. */
  def zval(x: Column, y: Column): Column =
    spreadBits(pmod(x, lit(65536)).cast(LongType))
      .bitwiseOR(shiftleft(spreadBits(pmod(y, lit(65536)).cast(LongType)), 1))

  /** Write `df` z-ordered on (`xCol`, `yCol`) into ~`numFiles` files. */
  def write(df: DataFrame, xCol: String, yCol: String, out: String, numFiles: Int): Unit =
    df.withColumn("_z", zval(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(out)
}
