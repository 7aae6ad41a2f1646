package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, In, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: push a signal-name filter INTO the [[ExplodeSignals]]
  * generator. `... LATERAL VIEW explode_signals(data) s AS name, ...
  * WHERE s.name = 'Vehicle.Speed'` normally computes all 18 signals per
  * document and discards 17; after this rewrite the generator only
  * evaluates the requested definitions — the Catalyst-level form of the
  * reference's signal-filter pushdown (`elastic.go:72-78` restricts the
  * fetched fields the same way). The residual Filter is kept (other
  * conjuncts may exist); the win is skipping per-row work, not rows.
  *
  * Injected by [[graft.GraftExtensions]] via `injectOptimizerRule`.
  */
object PushSignalNameFilter extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, g @ Generate(e: ExplodeSignals, _, outer, _, output, _))
        if e.requiredNames.isEmpty && !outer && output.nonEmpty =>
      val nameAttr = output.head // elementSchema field 0 = "name"
      val names = splitConjunctivePredicates(cond).iterator.map(requestedNames(_, nameAttr)).collectFirst {
        case Some(ns) if ns.nonEmpty => ns
      }
      names match {
        case Some(ns) =>
          f.copy(child = g.copy(generator = e.copy(requiredNames = Some(ns.toSeq.sorted))))
        case None => f
      }
  }

  /** `name = 'x'` or `name IN ('x','y')` (either operand order) → names. */
  private def requestedNames(conjunct: Expression, nameAttr: Attribute): Option[Set[String]] =
    conjunct match {
      case EqualTo(a: Attribute, Literal(s: UTF8String, StringType)) if a.semanticEquals(nameAttr) =>
        Some(Set(s.toString))
      case EqualTo(Literal(s: UTF8String, StringType), a: Attribute) if a.semanticEquals(nameAttr) =>
        Some(Set(s.toString))
      case In(a: Attribute, list) if a.semanticEquals(nameAttr) && list.forall {
            case Literal(_: UTF8String, StringType) => true
            case _                                  => false
          } =>
        Some(list.map(_.asInstanceOf[Literal].value.asInstanceOf[UTF8String].toString).toSet)
      case _ => None
    }
}
