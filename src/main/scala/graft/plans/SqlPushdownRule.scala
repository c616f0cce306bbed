package graft.plans

import graft.sources.{GraftScan, SqlBackend}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

/** Greedy largest-convertible-subtree pushdown — the Spark re-build of the
  * reference's `QueryPushdownOptimizerRule` (`src/optimizer.rs:16-39`):
  * try to convert the *entire* plan to backend SQL; on failure recurse into
  * children, so the largest fully-convertible subtree over graft-sqldb
  * relations is replaced by one [[PushedSqlQuery]] leaf and only the
  * remainder executes in Spark (`optimizer.rs:28-32`).
  *
  * Leaves must all be graft-sqldb scans of the *same* backend; each leaf
  * renders as the scan's own negotiated SQL (pruned columns + pushed
  * filters + limit), so column/filter pushdown composes with whole-query
  * fusion instead of being lost (the reference recovers its connector by
  * downcasting the scan's TableSource, `src/parser.rs:96-109,404-419` —
  * here the scan object itself carries the SQL).
  */
object SqlPushdownRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = attempt(plan)

  private def attempt(p: LogicalPlan): LogicalPlan = p match {
    case _: PushedSqlQuery => p
    case _ =>
      convert(p).getOrElse(p.withNewChildren(p.children.map(attempt)))
  }

  /** A pushable leaf: (backend, FROM-fragment). Handles both optimizer
    * stages — DataSourceV2Relation (injected rule runs before V2 scan
    * pushdown: plain table name, pushdown still expressed as plan nodes
    * above) and DataSourceV2ScanRelation (extraOptimizations run after:
    * the scan's own negotiated SQL becomes the leaf subquery). */
  private def leafOf(p: LogicalPlan): Option[(graft.sources.SqlBackend, String)] = p match {
    case r: DataSourceV2ScanRelation => r.scan match {
      case g: GraftScan => Some((g.backend, s"(${g.renderedSql})"))
      case _ => None
    }
    case r: DataSourceV2Relation => r.table match {
      case t: graft.sources.GraftSqlTable => Some((t.backend, t.tableName))
      case _ => None
    }
    case _ => None
  }

  /** True when the subtree is only Project/Filter/Limit over one relation —
    * exactly the surface the DSv2 scan already negotiates (prune + filter +
    * limit pushdown). Fusing such a subtree into a [[PushedSqlQuery]] buys
    * no extra pushdown but DOWNGRADES the scan: a PushedSqlQuery leaf is a
    * whole-query fetch with no partitioned parallel read, no catalog
    * statistics, and no runtime (dynamic-pruning) filtering — all of which
    * the DSv2 path provides. At scale the partitioned read wins, so these
    * subtrees stay on the scan path. (Residual filters the scan could not
    * render re-evaluate in Spark — cheap relative to a single-stream
    * whole-table fetch.) */
  private def dsv2AlreadyExpresses(p: LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, LocalLimit, Project}
    p match {
      case Project(_, c) => dsv2AlreadyExpresses(c)
      case Filter(_, c) => dsv2AlreadyExpresses(c)
      case GlobalLimit(_, c) => dsv2AlreadyExpresses(c)
      case LocalLimit(_, c) => dsv2AlreadyExpresses(c)
      case _: DataSourceV2Relation | _: DataSourceV2ScanRelation => true
      case _ => false
    }
  }

  private def convert(p: LogicalPlan): Option[LogicalPlan] = {
    if (dsv2AlreadyExpresses(p)) return None
    // include plans nested in subquery EXPRESSIONS (EXISTS / IN / scalar):
    // they are not plan children, but SqlGen renders them into the same
    // SQL string, so their leaves must satisfy the same single-backend rule
    val leaves = (p +: p.subqueriesAll).flatMap(_.collectLeaves())
    val infos = leaves.flatMap(leafOf)
    // every leaf is a graft relation on one shared backend, else not convertible
    if (infos.isEmpty || infos.size != leaves.size) return None
    val backend: SqlBackend = infos.head._1
    if (!infos.forall(_._1 eq backend)) return None
    // dialects the generator can't fully target keep scan-level pushdown
    // only (e.g. Derby: no LIMIT/OFFSET spelling, no standalone booleans)
    if (!backend.dialect.fullSqlGen) return None

    val resolver: SqlGen.TableResolver = pl => leafOf(pl).map(_._2)

    SqlGen(p, resolver, backend.dialect) match {
      case Right(sql) => Some(PushedSqlQuery(p.output, sql, backend))
      case Left(why) =>
        if (sys.props.contains("graft.pushdown.debug"))
          System.err.println(s"[pushdown] ${p.nodeName} not converted: $why")
        None
    }
  }
}

/** `SparkSessionExtensions` wiring (config
  * `spark.sql.extensions=graft.plans.GraftExtensions`) — analog of
  * `make_rdbms_context` registering planner + optimizer rule
  * (`src/lib.rs:22-32`). For an already-built session use
  * [[GraftExtensions.install]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SqlPushdownRule)
    e.injectPlannerStrategy(_ => PushedSqlStrategy)
  }
}

object GraftExtensions {
  /** Runtime installation on an existing session. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(SqlPushdownRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SqlPushdownRule
    if (!spark.experimental.extraStrategies.contains(PushedSqlStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ PushedSqlStrategy
  }
}
