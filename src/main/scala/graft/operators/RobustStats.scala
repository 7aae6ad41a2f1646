package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.NumericBits

/** Exact rank-selection statistics that scale.
  *
  * The obvious exact per-key median — `row_number()` over a per-key window —
  * funnels every row of a key through ONE task (no map-side combine): the
  * skew bomb this codebase bans everywhere else (see the q92 NOTES entry).
  * This is the scalable form: two-level rank-select over a DATA-INDEPENDENT
  * bucket grid (the top bits of [[NumericBits.doubleSortableBits]], a
  * monotone double→long map), so no min/max pre-pass is needed:
  *
  *   1. one hash aggregate: per-(key, bucket) row counts     [map-side combine]
  *   2. a cumulative-count window over the bounded grouped grid finds each
  *      key's total n, the target rank k = ⌈n/2⌉, the bucket b* holding it,
  *      and the residual rank r within that bucket
  *   3. one more hash aggregate confined to b* (the values sharing one
  *      2^shift bit-prefix) + the same bounded cumsum picks the exact
  *      rank-r value
  *
  * Three barriers total; every corpus-sized step is a two-phase hash
  * aggregate, and windows only ever see the grouped grid (≤ 2^(64-shift)
  * rows per key — ~2.5k occupied cells for values spread over a few
  * orders of magnitude at the default shift). Bucketing is monotone, so
  * recomputing the identical expression in pass 3 re-finds exactly the
  * candidate rows. The lower median is the value at sorted position ⌈n/2⌉;
  * duplicates crossing that boundary are resolved by exact integer counts,
  * and the picked VALUE is independent of any tie-break among equal values
  * (which is why no id column is needed). Precondition: a null-free value
  * column (callers filter; engines disagree on NULL ordering anyway).
  *
  * The per-key target table is provably one row per key — it is broadcast
  * explicitly so the probe side can never be planned as a corpus shuffle.
  */
object RobustStats {

  /** Per-key exact lower median of a double column → (key, `out`). */
  def lowerMedianByKey(df: DataFrame, keyCol: String, valueCol: String,
                       shift: Int = 44, out: String = "median"): DataFrame =
    rankSelectByKey(df, keyCol, valueCol, 1, 2, shift, out)

  /** Per-key exact order statistic: the value at sorted position
    * ⌈n·num/den⌉ (so (1,2) = lower median, (1,4)/(3,4) = lower quartiles).
    */
  def rankSelectByKey(df: DataFrame, keyCol: String, valueCol: String,
                      num: Int, den: Int,
                      shift: Int = 44, out: String = "q"): DataFrame =
    rankSelectMultiByKey(df, keyCol, valueCol, Seq((num, den, out)), shift)
      .groupBy(col(keyCol))
      .agg(max(col("_value")).as(out))

  /** Several per-key order statistics in ONE machinery pass: for each
    * (num, den, name) fraction, the exact value at sorted position
    * ⌈n·num/den⌉, returned long-form as (key, _q = name, _value). All
    * fractions share the corpus bucket-count aggregate and the grid
    * cumsum — asking for q1 and q3 costs the same two corpus passes as
    * asking for one median. `shift` trades the pass-2 window bound
    * (2^(64-shift) grid cells) against pass-3 refine size (rows whose
    * sortable bits share a 2^shift prefix).
    */
  def rankSelectMultiByKey(df: DataFrame, keyCol: String, valueCol: String,
                           fracs: Seq[(Int, Int, String)],
                           shift: Int = 44): DataFrame = {
    require(fracs.nonEmpty)
    fracs.foreach { case (num, den, _) =>
      require(num > 0 && den > 0 && num <= den, s"rank fraction $num/$den out of (0,1]")
    }
    val v = col(valueCol)
    def bucketOf(c: org.apache.spark.sql.Column) =
      shiftright(NumericBits.doubleSortableBits(c), shift)

    // pass 1: per-(key, bucket) counts — the only corpus-sized aggregate
    val bucketCounts = df.groupBy(col(keyCol), bucketOf(v).as("_b"))
      .agg(count(lit(1)).as("_c"))

    // pass 2: bounded cumsum over the grid → per-key total n; then for
    // EACH fraction its rank k = ⌈n·num/den⌉ (integer ceil-div), the
    // bucket b* holding it, and the residual rank r inside b*. The
    // whole-partition sum shares the running window's sort — one shuffle,
    // and the grid exchange is shared by every fraction (tiny rows).
    val wb = Window.partitionBy(col(keyCol)).orderBy(col("_b"))
    val wAll = Window.partitionBy(col(keyCol))
    val grid = bucketCounts
      .withColumn("_cum", sum(col("_c")).over(wb))
      .withColumn("_n", sum(col("_c")).over(wAll))
    // ONE grid pass emits every fraction's target row: each grid line
    // explodes over the (literal, tiny) fraction list and keeps the
    // fractions whose rank lands in its bucket. The previous
    // union-of-filters form re-ran the cumsum WINDOW once per fraction —
    // ReuseExchange shares only the exchange below a duplicated subtree,
    // not the window/filter above it, so nine deciles cost nine window
    // passes (r18 plan audit: q123's declared plan was 708 lines, q162's
    // 1,462 with its pivot; one pass each now). Same rows out.
    val fracArr = array(fracs.map { case (num, den, name) =>
      struct(lit(name).as("q"), expr(s"(_n * $num + ${den - 1}) div $den").as("rk"))
    }: _*)
    val targets = grid
      .select(col(keyCol), col("_b"), col("_c"), col("_cum"), explode(fracArr).as("f"))
      .where(col("_cum") >= col("f.rk") && col("_cum") - col("_c") < col("f.rk"))
      .select(col(keyCol), col("f.q").as("_q"), col("_b").as("_tb"),
        (col("f.rk") - (col("_cum") - col("_c"))).as("_r"))

    // pass 3: ONE refine over all target buckets — per-(key, fraction,
    // value) counts + the same bounded cumsum picks each exact rank-r
    // value. A corpus row matching two fractions' buckets contributes to
    // both groups, which is exactly right.
    val wv = Window.partitionBy(col(keyCol), col("_q")).orderBy(v)
    df.join(broadcast(targets), keyCol)
      .where(bucketOf(v) === col("_tb"))
      .groupBy(col(keyCol), col("_q"), v)
      .agg(count(lit(1)).as("_c"), max(col("_r")).as("_r"))
      .withColumn("_cum", sum(col("_c")).over(wv))
      .where(col("_cum") >= col("_r") && col("_cum") - col("_c") < col("_r"))
      .select(col(keyCol), col("_q"), v.as("_value"))
  }
}
