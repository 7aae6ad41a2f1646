package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** double → order-preserving long: `bits ^ ((bits >> 63) & 0x7fff…f)` —
  * the classic sortable-bits map (flip all non-sign bits of negatives, so
  * two's-complement long order equals IEEE-754 double order; -0.0 < +0.0,
  * NaN sorts last). Its value is that `key >> s` is a DATA-INDEPENDENT
  * monotone bucket grid: rank-selection (RobustStats) can bucket-partition
  * a double column without first scanning for min/max, removing one whole
  * corpus pass + barrier from every exact-median computation.
  */
object NumericBitsSupport {
  def doubleSortableBits(d: Double): Long = {
    val l = java.lang.Double.doubleToLongBits(d)
    l ^ ((l >> 63) & 0x7fffffffffffffffL)
  }
}

/** double → long sortable key; codegen-native. */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"DoubleSortableBits expects double, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    NumericBitsSupport.doubleSortableBits(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NumericBitsSupport.doubleSortableBits($c);")

  override protected def withNewChildInternal(newChild: Expression): DoubleSortableBits =
    copy(child = newChild)
}

object NumericBits {
  def doubleSortableBits(v: Column): Column =
    ColumnBridge.column(DoubleSortableBits(ColumnBridge.expression(v)))
}
