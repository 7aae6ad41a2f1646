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
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", "", name, usage, "", "", "", "", "", "", "built-in")

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
  }
}
