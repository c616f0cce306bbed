package graft.plans

import graft.sources.SqlBackend

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}

/** Logical leaf carrying a complete generated SQL string destined for the
  * backend — the analog of the reference's `SqlAstPlanNode` extension node
  * (`src/node.rs:22-33`) that replaces the largest convertible subtree. */
case class PushedSqlQuery(output: Seq[Attribute], sql: String,
    backend: SqlBackend, slices: Seq[String] = Nil) extends LeafNode {
  /** LeafNode's default THROWS — without this, any residual Spark operator
    * above the pushed leaf (e.g. a join with a non-graft table) crashes in
    * physical planning when JoinSelection asks for stats. The backend can't
    * estimate the result, so report the conservative default (which also
    * keeps the planner from auto-broadcasting a federated result of
    * unknown size; the reference likewise stubs statistics,
    * `src/physical_plan.rs:96-100`). */
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = conf.defaultSizeInBytes)
  override def simpleString(maxFields: Int): String =
    s"PushedSqlQuery [${sql.take(120)}…] backend=${backend.name}" +
      (if (slices.size > 1) s" slices=${slices.size}" else "")
}

/** Physical node executing the whole generated query on the backend — the
  * analog of `DatabaseExec` (`src/physical_plan.rs:28-132`): the plan
  * fragment above this node runs in Spark; everything below was fused into
  * one SQL statement answered by the external store. When the pushdown
  * rule proved the query sliceable (window-partition alignment), `slices`
  * carries N disjoint queries whose UNION ALL equals `sql`, executed as an
  * N-partition parallel read instead of one stream. */
case class PushedSqlExec(output: Seq[Attribute], sql: String,
    backend: SqlBackend, slices: Seq[String] = Nil) extends LeafExecNode {
  override protected def doExecute(): RDD[InternalRow] =
    if (slices.size > 1) backend.executeSqlsToRdd(slices, schema)
    else backend.executeSqlToRdd(sql, schema)
  override def simpleString(maxFields: Int): String =
    s"PushedSqlExec [${sql.take(120)}…] backend=${backend.name}" +
      (if (slices.size > 1) s" slices=${slices.size}" else "")
}

/** Strategy planning the extension leaf — analog of the reference's
  * `ExtensionPlanner` inside `SqlDatabaseQueryPlanner`
  * (`src/physical_plan.rs:161-215`). */
object PushedSqlStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PushedSqlQuery(output, sql, backend, slices) =>
      PushedSqlExec(output, sql, backend, slices) :: Nil
    case _ => Nil
  }
}
