package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation,
  LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.engine.CdcEngine

/** Metadata-only aggregate pushdown — the icelite analog of Iceberg's
  * `SupportsPushDownAggregates`: a filterless global `count(*)` / `min` /
  * `max` DIRECTLY over a table state read is answered from the manifest
  * (file live-row counts and column bounds) and rewritten into a one-row
  * [[LocalRelation]] — no file is opened, no scan stage runs. At 100 TB
  * this is the difference between a metadata read and a full-table scan
  * for the most common inspection queries.
  *
  * Runs as a POST-HOC resolution rule (plan fully resolved, aliases and
  * output names final, and — unlike the optimizer — nothing has rewritten
  * the subtree yet, so the [[CdcEngine.MetaScanTag]] set by `stateOf` is
  * still on the read's root). The rewrite fires only when the manifest can
  * answer EXACTLY ([[CdcEngine.metaCount]] / [[CdcEngine.metaBounds]]
  * return Some — every live file merged, live-row decided, bounds present,
  * tombstone-free for bounds); anything else leaves the plan untouched and
  * the scan proceeds. Covers `spark.sql("SELECT count(*) FROM ice.t")`,
  * `spark.table("ice.t").count()`, and `engine.currentState().count()`
  * alike, including `VERSION AS OF` reads (the tag pins the snapshot).
  *
  * All requested aggregates are computed against ONE pinned snapshot id
  * resolved up front, so a concurrent commit between two lookups cannot
  * mix table versions inside a single result row.
  */
class IceliteMetaAggRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case agg @ Aggregate(Nil, aggs, child, _) if agg.resolved && aggs.nonEmpty =>
      val stripped = strip(child)
      stripped.getTagValue(CdcEngine.MetaScanTag) match {
        case Some((engine, asOf)) =>
          rewrite(aggs, stripped, engine, asOf).getOrElse(agg)
        case None => agg
      }
  }

  /** Peel wrappers that change neither cardinality nor attribute identity:
    * subquery aliases and bare-attribute projections (`select("*")`). Any
    * other node (Filter, Join, a computing Project…) blocks the rewrite. */
  @annotation.tailrec
  private def strip(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => strip(c)
    case Project(list, c) if list.forall(_.isInstanceOf[AttributeReference]) =>
      strip(c)
    case other => other
  }

  private sealed trait Req
  private case object CountReq extends Req
  private case class BoundReq(column: String, isMin: Boolean) extends Req
  private case class LitReq(value: Any) extends Req // already-internal value

  private def rewrite(aggs: Seq[NamedExpression], scan: LogicalPlan,
      engine: CdcEngine, asOf: Option[Long]): Option[LogicalPlan] = {
    // name of the scan-output column an aggregate argument refers to
    def colOf(a: AttributeReference): Option[String] =
      scan.output.find(_.exprId == a.exprId).map(_.name)

    val reqs: Seq[Option[Req]] = aggs.map {
      case Alias(AggregateExpression(fn, _, false, None, _), _) => fn match {
        case Count(Seq(Literal(v, _))) if v != null => Some(CountReq)
        case Min(a: AttributeReference) => colOf(a).map(BoundReq(_, isMin = true))
        case Max(a: AttributeReference) => colOf(a).map(BoundReq(_, isMin = false))
        case _ => None
      }
      case Alias(Literal(v, _), _) => Some(LitReq(v))
      case _ => None
    }
    if (reqs.exists(_.isEmpty)) return None
    if (!reqs.exists(r => r.contains(CountReq) || r.exists(_.isInstanceOf[BoundReq])))
      return None // nothing the manifest answers — leave constant-only plans be

    // Pin the snapshot ONCE; -1 = table empty (count 0, bounds null).
    val pinned: Long = asOf.getOrElse(engine.table.currentSnapshotId)
    val bounds = scala.collection.mutable.Map.empty[String, (Option[Any], Option[Any])]
    val values: Seq[Option[Any]] = reqs.map(_.get).map {
      case CountReq =>
        if (pinned < 0) Some(0L) else engine.metaCount(pinned)
      case BoundReq(c, isMin) =>
        if (pinned < 0) Some(null)
        else bounds.get(c).orElse {
          val b = engine.metaBounds(c, pinned)
          b.foreach(bounds.update(c, _))
          b
        }.map(b => (if (isMin) b._1 else b._2).map(
          CatalystTypeConverters.convertToCatalyst).orNull)
      case LitReq(v) => Some(v)
    }
    if (values.exists(_.isEmpty)) return None // manifest can't answer: scan
    Some(LocalRelation(aggs.map(_.toAttribute),
      Seq(InternalRow.fromSeq(values.map(_.get)))))
  }
}
