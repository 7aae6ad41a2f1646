package graft

import graft.functions.DotProduct
import graft.plans.ExplodeSignals
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: registers the custom Catalyst surface as SQL
  * functions so `spark.sql` users get the same operators as the DataFrame
  * API. Install with
  * `--conf spark.sql.extensions=graft.GraftExtensions`, or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.PushSignalNameFilter)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", "", name, usage, "", "", "", "", "", "", "built-in")

  /** Literal-int argument of a SQL function call (e.g. the shingle width). */
  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def litLong(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - sequential dot product of two array<double> columns"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))
    ),
    (
      FunctionIdentifier("explode_signals"),
      info("explode_signals", "explode_signals(json) - one row per VSS signal present in a status payload"),
      (children: Seq[Expression]) => ExplodeSignals(children.head)
    ),
    (
      FunctionIdentifier("canon_alnum"),
      info("canon_alnum", "canon_alnum(s) - lower + keep [a-z0-9 ] + collapse spaces + trim, one fused pass"),
      (children: Seq[Expression]) => graft.functions.CanonAlnum(children.head)
    ),
    (
      FunctionIdentifier("image_dims"),
      info("image_dims", "image_dims(bytes) - struct(format,width,height) from PNG/GIF/JPEG headers"),
      (children: Seq[Expression]) => graft.functions.ImageDims(children.head)
    ),
    (
      FunctionIdentifier("wav_info"),
      info("wav_info", "wav_info(bytes) - struct(sample_rate,channels,bits,n_samples) from RIFF/WAVE headers"),
      (children: Seq[Expression]) => graft.functions.WavInfo(children.head)
    ),
    (
      FunctionIdentifier("mp4_info"),
      info("mp4_info", "mp4_info(bytes) - struct from MP4 box walk"),
      (children: Seq[Expression]) => graft.functions.Mp4Info(children.head)
    ),
    (
      FunctionIdentifier("simhash_word"),
      info("simhash_word", "simhash_word(hashes) - 64-bit simhash over an array<long> of token hashes"),
      (children: Seq[Expression]) => graft.functions.SimHashWord(children.head)
    ),
    (
      FunctionIdentifier("token_hash32"),
      info("token_hash32", "token_hash32(tokens, byte_offset) - per-token 32-bit md5-prefix hash array"),
      (children: Seq[Expression]) =>
        graft.functions.TokenHash32(children.head, litInt(children(1), "byte_offset"))
    ),
    (
      FunctionIdentifier("shingle_hash32"),
      info("shingle_hash32", "shingle_hash32(tokens, k, mod) - distinct hashed k-shingles of a token array"),
      (children: Seq[Expression]) =>
        graft.functions.ShingleHash32(children.head, litInt(children(1), "k"),
          litLong(children(2), "mod"))
    ),
    (
      FunctionIdentifier("chargram_hash32"),
      info("chargram_hash32", "chargram_hash32(s, k) - distinct hashed character k-grams"),
      (children: Seq[Expression]) =>
        graft.functions.CharGramHash32(children.head, litInt(children(1), "k"))
    ),
    (
      FunctionIdentifier("double_sortable_bits"),
      info("double_sortable_bits", "double_sortable_bits(x) - order-preserving 64-bit image of a double"),
      (children: Seq[Expression]) => graft.functions.DoubleSortableBits(children.head)
    )
  )

  /** Register on an already-built session (tests, notebooks). The
    * optimizer rule lands in `experimental.extraOptimizations` (same
    * effect as `injectOptimizerRule` for a session built with the
    * extensions class).
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraOptimizations.contains(graft.plans.PushSignalNameFilter))
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ graft.plans.PushSignalNameFilter
    if (!classic.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
      classic.experimental.extraStrategies =
        classic.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
    if (!classic.experimental.extraStrategies.contains(graft.plans.RangeJoinStrategy))
      classic.experimental.extraStrategies =
        classic.experimental.extraStrategies :+ graft.plans.RangeJoinStrategy
  }
}
