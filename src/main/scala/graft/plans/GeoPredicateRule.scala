package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Analysis-time rewrite of the xql custom geo predicates (P7,
  * xql/src/xql/where.py:140-171): `city = 'new york'` / `country = 'india'`
  * become bounding-box conjunctions over the `latitude`/`longitude`
  * coordinate columns before resolution, so they work anywhere in a WHERE
  * clause Catalyst sees — `spark.sql`, Dataset.filter(expr), views.
  *
  * The rule only fires on an UNRESOLVED `city`/`country` attribute: if the
  * relation actually has such a column, normal resolution wins and the
  * predicate keeps its ordinary meaning. This is the plan-level counterpart
  * of WxSql.rewriteGeoPredicates (the string-level form that works on
  * sessions built without graft extensions).
  */
object GeoPredicateRule extends Rule[LogicalPlan] {

  private def boxPredicate(kind: String, name: String): Option[Expression] =
    GeoConstants.lookup(kind, name).map { b =>
      val lat = UnresolvedAttribute("latitude")
      val lon = UnresolvedAttribute("longitude")
      And(
        And(GreaterThanOrEqual(lat, Literal(b.latMin)), LessThanOrEqual(lat, Literal(b.latMax))),
        And(GreaterThanOrEqual(lon, Literal(b.lonMin)), LessThanOrEqual(lon, Literal(b.lonMax))))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case f @ Filter(cond, child) =>
      val rewritten = cond.transformUp {
        case EqualTo(a: UnresolvedAttribute, Literal(v: UTF8String, StringType))
            if a.name.equalsIgnoreCase("city") || a.name.equalsIgnoreCase("country") =>
          boxPredicate(a.name.toLowerCase, v.toString).getOrElse(
            throw new IllegalArgumentException(
              s"Unsupported ${a.name.toLowerCase}: '${v.toString}'"))
        case EqualTo(Literal(v: UTF8String, StringType), a: UnresolvedAttribute)
            if a.name.equalsIgnoreCase("city") || a.name.equalsIgnoreCase("country") =>
          boxPredicate(a.name.toLowerCase, v.toString).getOrElse(
            throw new IllegalArgumentException(
              s"Unsupported ${a.name.toLowerCase}: '${v.toString}'"))
      }
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}
