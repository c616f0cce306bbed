package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for SQL backends — the Spark-idiomatic re-build
  * of the reference's `PostgresTableProvider` scan path
  * (`src/sqldb/postgres/table_provider.rs:79-159`):
  *
  *  - column pruning   → `SupportsPushDownRequiredColumns` (reference:
  *    projection indices → SELECT list, `table_provider.rs:87-98`)
  *  - filter pushdown  → `SupportsPushDownV2Filters` with capability
  *    negotiation (arithmetic/CAST/function predicates beyond the
  *    reference's classifier, `table_provider.rs:241-306`); unsupported
  *    predicates stay in Spark as residuals
  *  - limit pushdown   → `SupportsPushDownLimit` (`table_provider.rs:110-113`),
  *    plus complete top-N/offset, aggregates, and whole equi-joins
  *    (`SupportsPushDownJoin`) with parallel key-range-sliced reads
  *  - partitioned read → key-range or COUNT+OFFSET/FETCH splits, one SQL
  *    query per partition (reference `table_provider.rs:123-156`; its
  *    fixed 4-way split is an option here)
  *
  * Partitions carry SQL text only (never rows); each `PartitionReader`
  * drains its partition query through a `SqlConnection` (reference
  * `PostgresExec::execute`, `table_provider.rs:219-233`). A production JDBC
  * connection streams on the executor, so result size is bounded by
  * executor memory, not driver memory; the in-process test double instead
  * prefetches per-partition results on the driver at reader-factory time
  * (see [[ViewBackendConnection]] — its backend shares the engine's task
  * scheduler, and a task-side fetch would deadlock local mode).
  */
class GraftSqlTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sqldb"

  /** `url` selects the production JDBC backend; `pgwire`
    * ("host:port/database") the native Postgres-wire backend; `dir` the
    * in-process parquet-view double (tests / local benchmarking). */
  private def backend(options: CaseInsensitiveStringMap): SqlBackend =
    (Option(options.get("url")), Option(options.get("pgwire"))) match {
      case (Some(u), _) => JdbcBackend.forUrl(u)
      case (None, Some(a)) => PgWireBackend.forAddress(a)
      case _ => SparkViewBackend.forDir(options.get("dir"))
    }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    backend(options).schema(options.get("table"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GraftSqlTable(opts.get("table"), backend(opts), schema,
      math.max(1, opts.getInt("partitions", 4)))
  }
}

class GraftSqlTable(val tableName: String, val backend: SqlBackend,
    tableSchema: StructType, numPartitions: Int) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-sqldb.$tableName"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableName, backend, tableSchema, numPartitions)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    // `upsertKeys` (comma-separated) switches the write to key-matched
    // MERGE semantics — see [[GraftMergeBatchWrite]]
    new GraftWriteBuilder(tableName, backend, info.schema(),
      Option(info.options.get("upsertKeys")), info.queryId())
}

class GraftScanBuilder(private val table: String, private val backend: SqlBackend,
    private var full: StructType, numPartitions: Int) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownV2Filters
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownOffset with SupportsPushDownAggregates
    with SupportsPushDownJoin {

  private var required: StructType = full
  private var pushedV2: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty
  private var pushedV2Sql: Seq[String] = Nil
  private var limit: Option[Int] = None
  private var offset: Option[Int] = None
  private var orderBy: Seq[String] = Nil
  private var aggSql: Option[(Seq[String], StructType)] = None
  // when set, this builder represents a backend-side JOIN and the fragment
  // replaces the plain table as the FROM source (SupportsPushDownJoin)
  private var joinedFrom: Option[String] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (aggSql.isEmpty) required = requiredSchema

  // ---- join pushdown (SupportsPushDownJoin): the whole equi-join — and,
  // via the phase order of V2ScanRelationPushDown, any aggregate/top-N
  // above it — collapses into ONE backend query. This is the
  // Spark-idiomatic form of the reference's whole-query pushdown
  // (`src/optimizer.rs:16-39` rewrote the plan itself); dialect-safe, so
  // it fuses joins into backends SqlGen can't target (Derby). Enabled by
  // spark.sql.optimizer.datasourceV2JoinPushdown. ----

  override def isOtherSideCompatibleForJoin(
      other: SupportsPushDownJoin): Boolean = other match {
    // same backend INSTANCE: one database, one dialect, one connection
    // config (instances are cached per dir/url, so eq is exact identity)
    case o: GraftScanBuilder => (o.backend eq backend) &&
      aggSql.isEmpty && o.aggSql.isEmpty &&
      limit.isEmpty && o.limit.isEmpty &&
      // offset mirrors the limit/orderBy guards: sideSql never renders a
      // pushed offset, so accepting one here would silently drop it
      // (unreachable under current phase ordering — defense in depth)
      offset.isEmpty && o.offset.isEmpty &&
      orderBy.isEmpty && o.orderBy.isEmpty
    case _ => false
  }

  /** Aliased SELECT list for this side of a join. */
  private def selectList(cols: Array[SupportsPushDownJoin.ColumnWithAlias]): String = {
    val d = backend.dialect
    cols.map { cwa =>
      val src = d.quote(cwa.colName)
      Option(cwa.alias) match {
        case Some(a) if a != cwa.colName => s"$src AS ${d.quote(a)}"
        case _ => src
      }
    }.mkString(", ")
  }

  /** This side rendered as a join subquery: its current pushed filters are
    * baked in, every column selected under its (collision-free) alias. */
  private def sideSql(cols: Array[SupportsPushDownJoin.ColumnWithAlias]): String = {
    val d = backend.dialect
    val preds = staticPredSql
    val where = if (preds.isEmpty) "" else " WHERE " + preds.mkString(" AND ")
    s"SELECT ${selectList(cols)} FROM ${joinedFrom.getOrElse(d.quote(table))}$where"
  }

  /** Parallel-read machinery for a pushed join: slicing ONE base table —
    * the innermost LEFT table for INNER/LEFT joins, the RIGHT table for
    * RIGHT joins — splits the whole join, because each slice of that side
    * joins independently against the full other side and the union of
    * disjoint slices is exactly the join. (Slicing the left side of a
    * RIGHT join would repeat unmatched right rows per slice, and vice
    * versa — hence the side flip. FULL joins can slice neither side.)
    * Everything is captured BY VALUE at join time, since the builder's
    * fields mutate afterwards. */
  private var joinSplit: Option[JoinSplit] = None

  /** Output fields contributed by one side, in Spark's requested order,
    * renamed per alias. `forceNullable` widens the outer side of an outer
    * join — the reader decodes against this schema, and a non-nullable
    * field that the join NULL-extends would corrupt silently. */
  private def sideFields(cols: Array[SupportsPushDownJoin.ColumnWithAlias],
      schema: StructType, forceNullable: Boolean): Seq[org.apache.spark.sql.types.StructField] =
    cols.toSeq.map { cwa =>
      val f = schema.fields.find(_.name == cwa.colName).getOrElse(
        throw new IllegalArgumentException(s"join column ${cwa.colName} not in $schema"))
      val name = Option(cwa.alias).getOrElse(cwa.colName)
      f.copy(name = name, nullable = f.nullable || forceNullable)
    }

  override def pushDownJoin(other: SupportsPushDownJoin,
      joinType: org.apache.spark.sql.connector.join.JoinType,
      leftCols: Array[SupportsPushDownJoin.ColumnWithAlias],
      rightCols: Array[SupportsPushDownJoin.ColumnWithAlias],
      condition: org.apache.spark.sql.connector.expressions.filter.Predicate): Boolean = {
    import org.apache.spark.sql.connector.join.JoinType
    val o = other.asInstanceOf[GraftScanBuilder]
    val kw = joinType match {
      case JoinType.INNER_JOIN => Some("JOIN")
      case JoinType.LEFT_OUTER_JOIN => Some("LEFT JOIN")
      case JoinType.RIGHT_OUTER_JOIN => Some("RIGHT JOIN")
      case _ => None
    }
    val cond = V2PredicateSql.render(condition, backend.dialect)
    if (kw.isEmpty || cond.isEmpty) return false
    // condition references the POST-alias names, which are exactly the two
    // subqueries' output columns — disjoint by construction, no qualifiers
    val d = backend.dialect
    val leftSql = sideSql(leftCols)
    val rightSql = o.sideSql(rightCols)
    val fragment = s"($leftSql) gj_l ${kw.get} ($rightSql) gj_r ON ${cond.get}"

    // capture the split machinery BY VALUE before any field mutates: an
    // extra predicate (key-range slice) or tail clause (deterministic
    // ORDER BY + OFFSET/FETCH window) lands on the innermost base-table
    // subquery of the sliced side — where every base column is in scope,
    // projected or not — either appended to the side subquery just
    // rendered, or threaded through the previous join level's own
    // rewriters
    val leftSel = selectList(leftCols)
    val leftPreds = staticPredSql
    // left-side rewriters (INNER/LEFT joins slice the innermost left table)
    val mkLeft: Option[JoinSplit.Inner] = joinedFrom match {
      case None => Some(JoinSplit.Inner(
        table,
        leftPreds,
        e => leftSql + (if (leftPreds.nonEmpty) s" AND $e" else s" WHERE $e"),
        sfx => leftSql + sfx))
      case Some(_) =>
        joinSplit.map { js =>
          // must mirror sideSql exactly: predicates pushed onto the
          // already-joined builder (none under today's phase order, but
          // a future phase-order change must not silently widen the
          // range-split fragments relative to the single-stream one)
          val where =
            if (leftPreds.isEmpty) "" else " WHERE " + leftPreds.mkString(" AND ")
          JoinSplit.Inner(
            js.probeTable,
            js.probePreds,
            e => s"SELECT $leftSel FROM ${js.mkPred(e)}$where",
            sfx => s"SELECT $leftSel FROM ${js.mkSuffix(sfx)}$where")
        }
    }
    // right-side rewriters (RIGHT joins slice the right table; only a
    // plain right side — a right-side join chain stays single-stream)
    val rightPreds = o.staticPredSql
    val mkRight: Option[JoinSplit.Inner] =
      if (o.joinedFrom.isEmpty) Some(JoinSplit.Inner(
        o.table,
        rightPreds,
        e => rightSql + (if (rightPreds.nonEmpty) s" AND $e" else s" WHERE $e"),
        sfx => rightSql + sfx))
      else None

    val merged = StructType(
      sideFields(leftCols, full, forceNullable = joinType == JoinType.RIGHT_OUTER_JOIN) ++
        o.sideFields(rightCols, o.full, forceNullable = joinType == JoinType.LEFT_OUTER_JOIN))
    joinSplit = joinType match {
      case JoinType.INNER_JOIN | JoinType.LEFT_OUTER_JOIN =>
        mkLeft.map(in => JoinSplit(in.probeTable, in.probePreds,
          e => s"(${in.mkPred(e)}) gj_l ${kw.get} ($rightSql) gj_r ON ${cond.get}",
          sfx => s"(${in.mkSuffix(sfx)}) gj_l ${kw.get} ($rightSql) gj_r ON ${cond.get}"))
      case JoinType.RIGHT_OUTER_JOIN =>
        mkRight.map(in => JoinSplit(in.probeTable, in.probePreds,
          e => s"($leftSql) gj_l ${kw.get} (${in.mkPred(e)}) gj_r ON ${cond.get}",
          sfx => s"($leftSql) gj_l ${kw.get} (${in.mkSuffix(sfx)}) gj_r ON ${cond.get}"))
      case _ => None
    }
    joinedFrom = Some(fragment)
    full = merged
    required = merged
    // baked into the left subquery above
    pushedV2 = Array.empty
    pushedV2Sql = Nil
    true
  }

  // ---- aggregate pushdown (whole GROUP BY answered by the backend — the
  // reference's aggregate-pushdown scenario, tests/aggregate.rs:25-44) ----

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames()(0))
      case _ => None
    }

  private def fieldType(n: String): Option[org.apache.spark.sql.types.DataType] =
    full.fields.find(_.name == n).map(_.dataType)

  private def sumType(dt: org.apache.spark.sql.types.DataType) = dt match {
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
      Some(org.apache.spark.sql.types.LongType)
    case org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType =>
      Some(org.apache.spark.sql.types.DoubleType)
    case _ => None
  }

  /** Statistical V2 aggregates with a shared SQL spelling; availability is
    * still per-dialect via `supportsFunction` (Derby lacks CORR/COVAR). */
  private val StatAggNames = Set("STDDEV_SAMP", "STDDEV_POP", "VAR_SAMP",
    "VAR_POP", "CORR", "COVAR_SAMP", "COVAR_POP")

  /** Translate a V2 Aggregation to (select items, GROUP BY items, result
    * schema); None if any piece is beyond the backend's negotiated
    * surface. Memoized per Aggregation instance: Spark calls
    * supportCompletePushDown then pushAggregation with the same object. */
  private var aggCacheKey: Aggregation = _
  private var aggCacheVal: Option[(Seq[String], Seq[String], StructType)] = None
  private def translateAggCached(agg: Aggregation): Option[(Seq[String], Seq[String], StructType)] = {
    if (!(aggCacheKey eq agg)) { aggCacheKey = agg; aggCacheVal = translateAgg(agg) }
    aggCacheVal
  }

  private def translateAgg(agg: Aggregation): Option[(Seq[String], Seq[String], StructType)] = {
    val d = backend.dialect
    val groups = agg.groupByExpressions.toSeq.map(fieldOf)
    if (groups.exists(_.isEmpty)) return None
    val groupItems = groups.flatten.map(n => (d.quote(n), full.fields.find(_.name == n)))
    if (groupItems.exists(_._2.isEmpty)) return None
    val aggItems: Seq[Option[(String, org.apache.spark.sql.types.DataType)]] =
      agg.aggregateExpressions.toSeq.zipWithIndex.map {
        case (_: CountStar, _) => Some(("COUNT(*)", org.apache.spark.sql.types.LongType))
        case (c: Count, _) =>
          fieldOf(c.column).map { n =>
            val dist = if (c.isDistinct) "DISTINCT " else ""
            (s"COUNT($dist${d.quote(n)})", org.apache.spark.sql.types.LongType)
          }
        case (m: Min, _) =>
          for { n <- fieldOf(m.column); t <- fieldType(n) } yield (s"MIN(${d.quote(n)})", t)
        case (m: Max, _) =>
          for { n <- fieldOf(m.column); t <- fieldType(n) } yield (s"MAX(${d.quote(n)})", t)
        case (sm: Sum, _) =>
          for {
            n <- fieldOf(sm.column); t <- fieldType(n); st <- sumType(t)
          } yield {
            val dist = if (sm.isDistinct) "DISTINCT " else ""
            (s"SUM($dist${d.quote(n)})", st)
          }
        case (a: Avg, _) =>
          // DOUBLE input only: every backend then agrees the result is
          // DOUBLE computed in double arithmetic. Integer/float inputs
          // diverge (Derby's AVG(INT) truncates to INT, AVG(REAL) stays
          // single-precision) — those stay in Spark.
          for {
            n <- fieldOf(a.column); t <- fieldType(n)
            if t == org.apache.spark.sql.types.DoubleType
          } yield {
            val dist = if (a.isDistinct) "DISTINCT " else ""
            (s"AVG($dist${d.quote(n)})", org.apache.spark.sql.types.DoubleType)
          }
        // statistical aggregates, name-gated per dialect (Derby 10.16 has
        // the STDDEV/VAR family but not CORR/COVAR — probed; Spark offers
        // these only under complete pushdown, so there is no partial-agg
        // merge problem). DOUBLE columns only: on integer inputs Spark
        // wraps the child in a cast, which fieldOf declines anyway.
        case (g: GeneralAggregateFunc, _)
            if StatAggNames(g.name) && !g.isDistinct &&
              g.orderingWithinGroups.isEmpty && d.supportsFunction(g.name) =>
          val cols = g.children.toSeq.map(fieldOf)
          for {
            ns <- if (cols.exists(_.isEmpty)) None else Some(cols.flatten)
            if ns.nonEmpty &&
              ns.forall(n => fieldType(n).contains(org.apache.spark.sql.types.DoubleType))
          } yield (s"${g.name}(${ns.map(d.quote).mkString(", ")})",
            org.apache.spark.sql.types.DoubleType)
        case _ => None
      }
    if (aggItems.exists(_.isEmpty)) return None
    // aggregates are aliased to their readSchema names so whole-query
    // fusion can reference the scan's output columns by name
    val selects = groupItems.map(_._1) ++
      aggItems.flatten.zipWithIndex.map { case ((sql, _), i) =>
        s"$sql AS ${d.quote(s"agg_func_$i")}"
      }
    val fields = groupItems.map(_._2.get) ++
      aggItems.flatten.zipWithIndex.map { case ((_, t), i) =>
        org.apache.spark.sql.types.StructField(s"agg_func_$i", t)
      }
    Some((selects, groupItems.map(_._1), StructType(fields)))
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    translateAggCached(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean =
    translateAggCached(aggregation) match {
      case Some((selects, groupCols, schema)) =>
        aggSql = Some((selects, schema))
        aggGroupBy = groupCols
        required = schema
        true
      case None => false
    }
  private var aggGroupBy: Seq[String] = Nil

  /** Capability negotiation over V2 predicates (Spark prefers V1
    * `SupportsPushDownFilters` when a source implements both, so ONLY the
    * V2 interface is implemented here): a predicate is pushed iff it
    * renders to the backend dialect via [[V2PredicateSql]]; everything
    * else is returned as a residual for Spark to re-evaluate (exactness
    * contract as in the reference: pushed predicates are NOT re-checked).
    * The V2 surface reaches past V1 source filters to expression
    * predicates — arithmetic, CAST, a whitelisted function set; the
    * reference's classifier stopped at columns/literals/binary-ops
    * (`table_provider.rs:241-306`). */
  override def pushPredicates(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = {
    val rendered = predicates.map(p => p -> V2PredicateSql.render(p, backend.dialect))
    pushedV2 = rendered.collect { case (p, Some(_)) => p }
    pushedV2Sql = rendered.collect { case (_, Some(sql)) => sql }.toSeq
    rendered.collect { case (p, None) => p } // residuals
  }
  override def pushedPredicates()
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = pushedV2

  /** Every static predicate this builder has accepted, rendered. */
  private def staticPredSql: Seq[String] = pushedV2Sql

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  /** ORDER BY + LIMIT answered entirely by the backend (the query shape a
    * federation layer wins biggest on: n rows cross the wire instead of
    * the table). Complete pushdown — the scan collapses to one partition
    * whose single backend query carries the full ORDER BY, so the global
    * order is the backend's and Spark drops its own TopK. Declined when
    * any sort key is more than a plain column (no shared rendering). */
  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder], l: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NullOrdering, SortDirection}
    val rendered = orders.toSeq.map { so =>
      so.expression() match {
        case f: NamedReference if f.fieldNames.length == 1 =>
          val dir = if (so.direction() == SortDirection.ASCENDING) "ASC" else "DESC"
          val nulls = if (so.nullOrdering() == NullOrdering.NULLS_FIRST)
            "NULLS FIRST" else "NULLS LAST"
          Some(s"${backend.dialect.quote(f.fieldNames()(0))} $dir $nulls")
        case _ => None
      }
    }
    if (rendered.exists(_.isEmpty)) false
    else {
      orderBy = rendered.flatten
      limit = Some(l)
      true
    }
  }
  override def isPartiallyPushed(): Boolean = false

  /** OFFSET composes with LIMIT/top-N in the same backend query. The limit
    * Spark passed to pushLimit/pushTopN INCLUDES the offset rows (it is
    * the total prefix the source must order), so a pushed offset deducts
    * itself from the pushed limit — the same contract Spark's own JDBC
    * scan builder implements. */
  override def pushOffset(o: Int): Boolean = {
    offset = Some(o)
    limit = limit.map(l => math.max(0, l - o))
    true
  }

  override def build(): Scan =
    new GraftScan(table, backend, required, limit,
      // aggregated scans answer in one backend query (the reference's
      // whole-query DatabaseExec was likewise single-stream,
      // src/physical_plan.rs:28-132); plain scans split by key range, and
      // joined scans split via joinSplit's probe-table rewriters (key
      // range, or ordered windows when that table is keyless)
      if (aggSql.isDefined) 1 else numPartitions,
      aggSql.map { case (selects, _) => (selects, aggGroupBy) },
      orderBy, offset, joinedFrom, joinSplit, pushedV2Sql)
}

/** V2 expression → backend SQL — used for join-pushdown conditions AND the
  * `SupportsPushDownV2Filters` static-predicate path, which reaches past
  * the V1 surface to expression filters (arithmetic, casts, a conservative
  * function set). The reference's classifier stopped at columns/literals/
  * binary-ops/cast (`table_provider.rs:241-306`). Conservative by
  * construction: any unrecognized name declines (residual in Spark), and
  * functions are whitelisted to spellings the target dialects share. */
object V2PredicateSql {
  import org.apache.spark.sql.connector.expressions.{Cast => V2Cast, Expression => V2Expr, GeneralScalarExpression, Literal => V2Literal}
  import graft.plans.SqlGen.Dialect

  def render(e: V2Expr, d: Dialect): Option[String] = e match {
    case f: NamedReference if f.fieldNames.length == 1 =>
      Some(d.quote(f.fieldNames()(0)))
    case l: V2Literal[_] =>
      // V2 literals carry Catalyst-internal values (UTF8String, day counts)
      val external = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(l.dataType)(l.value)
      FilterSql.literal(external, d)
    case c: V2Cast =>
      // Two gates. (1) LOSSLESS only: under ANSI mode (Spark 4's default)
      // V2ExpressionBuilder offers EVERY cast, including ones whose
      // runtime semantics diverge across engines (boolean→int spellings,
      // string→numeric parse rules, overflow behavior) — only casts Spark
      // deems an upcast are semantics-free enough to hand to a foreign
      // engine. (2) castTypeName, not typeName: legal CAST targets are a
      // narrower set than creatable DDL types (Derby forbids
      // numeric→VARCHAR). A null source type (2-arg connector Cast)
      // declines.
      for {
        in <- render(c.expression(), d)
        from <- Option(c.expressionDataType())
        if org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, c.dataType())
        t <- d.castTypeName(c.dataType())
      } yield s"CAST($in AS $t)"
    case g: GeneralScalarExpression => g.name() match {
      case "%" if g.children().length == 2 =>
        for {
          l <- render(g.children()(0), d); r <- render(g.children()(1), d)
          out <- d.remainder(l, r)
        } yield out
      case op @ ("=" | "<" | "<=" | ">" | ">=" | "<>" |
                 "+" | "-" | "*" | "/") if g.children().length == 2 =>
        binary(g, d, op)
      case "!=" => binary(g, d, "<>")
      case "AND" => binary(g, d, "AND")
      case "OR" => binary(g, d, "OR")
      case "-" if g.children().length == 1 =>
        render(g.children()(0), d).map(s => s"(- $s)")
      case "NOT" if g.children().length == 1 =>
        render(g.children()(0), d).map(s => s"(NOT $s)")
      case "IS_NULL" if g.children().length == 1 =>
        render(g.children()(0), d).map(s => s"($s IS NULL)")
      case "IS_NOT_NULL" if g.children().length == 1 =>
        render(g.children()(0), d).map(s => s"($s IS NOT NULL)")
      case "<=>" if d.supportsNullSafeEq && g.children().length == 2 =>
        for {
          l <- render(g.children()(0), d); r <- render(g.children()(1), d)
        } yield s"($l IS NOT DISTINCT FROM $r)"
      case "IN" if g.children().length >= 2 =>
        val rendered = g.children().toSeq.map(render(_, d))
        if (rendered.exists(_.isEmpty)) None
        else Some(s"(${rendered.head.get} IN (${rendered.tail.flatten.mkString(", ")}))")
      // string-prefix predicates render as LIKE only when the literal is
      // free of LIKE metacharacters (escape syntax is dialect-divergent —
      // same guard as the V1 path)
      case "STARTS_WITH" => like(g, d, v => v + "%")
      case "ENDS_WITH" => like(g, d, v => "%" + v)
      case "CONTAINS" => like(g, d, v => "%" + v + "%")
      // scalar functions every target dialect spells identically
      case fn @ ("ABS" | "UPPER" | "LOWER" | "COALESCE" | "SQRT" | "FLOOR" | "CEIL") =>
        val rendered = g.children().toSeq.map(render(_, d))
        if (rendered.isEmpty || rendered.exists(_.isEmpty)) None
        else Some(s"$fn(${rendered.flatten.mkString(", ")})")
      case _ => None
    }
    case _ => None
  }

  private def like(g: GeneralScalarExpression, d: Dialect,
      pattern: String => String): Option[String] = g.children() match {
    case Array(col, l: V2Literal[_]) =>
      val v = String.valueOf(org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(l.dataType)(l.value))
      if (!FilterSql.likeSafe(v)) None
      else render(col, d).map(c =>
        s"$c LIKE '${pattern(v).replace("'", "''")}'")
    case _ => None
  }

  private def binary(g: GeneralScalarExpression, d: Dialect, op: String): Option[String] =
    if (g.children().length != 2) None
    else for {
      l <- render(g.children()(0), d)
      r <- render(g.children()(1), d)
    } yield s"($l $op $r)"
}

/** By-value carrier of a pushed join's parallel-split machinery.
  * `probeTable` is the base table whose key range / row count the split
  * probe hits (under `probePreds`, that table's own pushed filters);
  * `mkPred` renders the full join FROM-fragment with a key-range
  * predicate spliced into that table's innermost subquery, `mkSuffix`
  * with an ORDER BY + OFFSET/FETCH window clause appended to it (the
  * deterministic fallback when the table declares no integral key). */
private[sources] case class JoinSplit(probeTable: String,
    probePreds: Seq[String],
    mkPred: String => String,
    mkSuffix: String => String)

private[sources] object JoinSplit {
  /** One side's innermost-subquery rewriters, before the fragment that
    * wraps them in the join is assembled. Same fields as [[JoinSplit]],
    * but the rewriters return the side SUBQUERY, not the FROM fragment. */
  case class Inner(probeTable: String, probePreds: Seq[String],
      mkPred: String => String, mkSuffix: String => String)
}

class GraftScan(val table: String, val backend: SqlBackend,
    val required: StructType,
    val limit: Option[Int], numPartitions: Int,
    val aggregation: Option[(Seq[String], Seq[String])] = None,
    val orderBy: Seq[String] = Nil, val offset: Option[Int] = None,
    val joinedFrom: Option[String] = None,
    val joinSplit: Option[JoinSplit] = None,
    val preRendered: Seq[String] = Nil)
    extends Scan with Batch
    with SupportsReportStatistics with SupportsRuntimeFiltering {

  override def readSchema(): StructType = required

  /** True iff NOTHING was pushed into this scan — no filters (static or
    * runtime), no aggregate, no limit/offset/top-N, no join fragment.
    * Column pruning alone keeps a scan pristine: dropping a projection
    * changes no row semantics. [[graft.plans.MvRewriteRule]] keys on this
    * to rewrite a post-pushdown federated relation safely — any absorbed
    * state would be invisible to the rule and silently dropped. */
  def pristine: Boolean =
    preRendered.isEmpty && runtimeFilters.isEmpty && aggregation.isEmpty &&
      limit.isEmpty && offset.isEmpty && orderBy.isEmpty && joinedFrom.isEmpty

  // ---- statistics (SupportsReportStatistics) ----
  // Sourced from the backend's CATALOG stats (no per-query probe), so
  // Catalyst's join planning sees a real size for federated tables and
  // auto-broadcasts small ones — without this, a DSv2 relation defaults to
  // sizeInBytes=Long.MaxValue and a small remote dimension can never be
  // the build side. The estimate ignores pushed filters (a safe upper
  // bound; V2 stats are consulted after pushdown, so there is no
  // double-discounting) and caps at a pushed LIMIT.
  override def estimateStatistics(): Statistics = {
    // a joined scan's cardinality is not a catalog fact — report unknown
    val catalogRows =
      if (joinedFrom.isDefined) None else backend.estimatedRowCount(table)
    val rows = (catalogRows, limit) match {
      case (Some(n), Some(l)) => Some(n min l.toLong)
      case (Some(n), None) => Some(n)
      case (None, Some(l)) => Some(l.toLong)
      case _ => None
    }
    // aggregated scans emit at most one row per group — unknowable from
    // catalog stats; the input bound still serves as a conservative cap
    val width = math.max(1,
      (if (required.isEmpty) 1 else required.defaultSize))
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        rows.map(n => java.util.OptionalLong.of(n * width))
          .getOrElse(java.util.OptionalLong.empty())
      override def numRows(): java.util.OptionalLong =
        rows.map(java.util.OptionalLong.of)
          .getOrElse(java.util.OptionalLong.empty())
    }
  }

  // ---- runtime filtering (SupportsRuntimeFiltering) ----
  // Dynamic-pruning filters (the IN-set of join keys observed on the other
  // side of a join at run time) re-render into the backend SQL, so the
  // remote scan reads only the keys the join can match — the federated
  // analog of dynamic partition pruning. Dropping a filter is always safe
  // here: the values come from the join's build side and the join itself
  // re-checks equality, so pushing is purely an optimization.
  private var runtimeFilters: Array[Filter] = Array.empty

  /** Upper bound on a runtime IN-list rendered into backend SQL — beyond
    * this the predicate text itself becomes the bottleneck (parse cost on
    * the backend, statement size limits) and scanning wins. */
  private val MaxRuntimeInValues = 1000

  private def runtimeRenderable(f: Filter): Boolean = f match {
    case sources.In(_, vs) if vs.length > MaxRuntimeInValues => false
    case other => FilterSql.render(other, backend.dialect).isDefined
  }

  override def filterAttributes(): Array[NamedReference] =
    // only the scan's OUTPUT columns: Spark resolves these refs against the
    // pruned read schema. Aggregated scans expose none — the WHERE clause
    // a runtime filter lands in runs before the pushed GROUP BY, and the
    // renamed agg outputs don't name base columns anyway. Top-N/offset
    // scans expose none either: with isPartiallyPushed()=false Spark has
    // deleted its own Sort/Limit/Offset, so the backend query's result IS
    // the final answer — a runtime filter rendered into its WHERE clause
    // would run before the ORDER BY/LIMIT and change which rows enter the
    // top-N (a join above a fully-pushed `orderBy(c).limit(5)` with DPP
    // would silently return rows beyond the true top 5).
    if (aggregation.isDefined || orderBy.nonEmpty || limit.isDefined ||
        offset.isDefined) Array.empty
    else required.fieldNames
      .map(n => org.apache.spark.sql.connector.expressions.Expressions.column(n))

  /** Order-insensitive identity of a runtime filter (an IN list's value
    * order is not semantic, and can differ across deliveries). */
  private def runtimeKey(f: Filter): String = f match {
    case sources.In(a, vs) =>
      a + " IN " + vs.map(String.valueOf).sorted.mkString("[", ",", "]")
    case other => other.toString
  }

  override def filter(runtime: Array[Filter]): Unit = {
    // IDEMPOTENT by filter identity: AQE re-evaluates runtime filters once
    // per BatchScanExec copy, delivering the same predicate repeatedly.
    // Re-planning on every delivery would mint fresh partition fetch ids
    // after a reader factory already prefetched the previous generation —
    // tasks would then miss the prefetch buffer and enter the task-side
    // fetch path, which can starve the local scheduler (see
    // ViewBackendConnection). Only a genuinely NEW predicate re-plans.
    // Defense-in-depth mirror of filterAttributes(): never accept a
    // delivery that would land a WHERE clause before a pushed top-N/
    // offset/aggregate (Spark shouldn't send one — the attribute list is
    // empty — but a dropped runtime filter is always safe, a misplaced
    // one is silently wrong).
    if (aggregation.isDefined || orderBy.nonEmpty || limit.isDefined ||
        offset.isDefined) return
    val ok = runtime.filter(runtimeRenderable)
    if (ok.nonEmpty) synchronized {
      val existing = runtimeFilters.map(runtimeKey).toSet
      val fresh = ok.filterNot(f => existing.contains(runtimeKey(f)))
      if (fresh.nonEmpty) {
        runtimeFilters ++= fresh
        // the superseded generation's prefetches will never be read — let
        // the registry reclaim them
        Option(plannedCache).foreach(_.foreach {
          case gp: GraftInputPartition => FetchRegistry.release(gp.fetchId)
        })
        plannedCache = null // re-plan partitions under the narrowed predicate
      }
    }
  }

  /** The SQL this scan sends (modulo partition ranges) — surfaced in
    * explain output like the reference's generated scan SQL. */
  def renderedSql: String = baseSql

  override def description(): String =
    s"GraftSqlScan(${backend.name}) [$renderedSql]"

  private def q(n: String): String = backend.dialect.quote(n)

  private def baseSql: String = sqlWith(None)

  /** The pushed + runtime filters, rendered together — the probes and every
    * partition query share one rendering pass, so bounds/counts cannot
    * drift from the data the partition predicates see. A def (not a lazy
    * val): runtime filters can arrive after the first rendering, and the
    * rendering itself is deterministic string work. */
  private def renderedFilters: Seq[String] =
    preRendered ++
      runtimeFilters.flatMap(FilterSql.render(_, backend.dialect)).toSeq

  /** Render the scan SQL, optionally AND-ing one extra predicate into the
    * WHERE clause (used by the range split — the predicate references the
    * table's key column directly, so it works even when the key is pruned
    * from the projection). */
  private def sqlWith(extra: Option[String],
      srcOverride: Option[String] = None): String = {
    val cols = aggregation match {
      case Some((selects, _)) => selects.mkString(", ")
      case None =>
        if (required.isEmpty) "1" // COUNT(*)-only scans prune every column
        else required.fieldNames.map(q).mkString(", ")
    }
    val src = srcOverride.getOrElse(joinedFrom.getOrElse(q(table)))
    val preds = renderedFilters ++ extra
    val where = if (preds.isEmpty) "" else " WHERE " + preds.mkString(" AND ")
    val group = aggregation match {
      case Some((_, g)) if g.nonEmpty => " GROUP BY " + g.mkString(", ")
      case _ => ""
    }
    val order = if (orderBy.isEmpty) "" else " ORDER BY " + orderBy.mkString(", ")
    val sel = backend.dialect.limitOffset(limit.map(_.toLong), offset.map(_.toLong))
    s"SELECT $cols FROM $src$where$group$order$sel"
  }

  /** The split column: a declared single-column integral unique key of
    * `t` — the scanned table for plain scans, [[JoinSplit.probeTable]]
    * (the table the split rewriters splice into) for joined scans. */
  private def rangeKeyOf(t: String): Option[String] = backend.uniqueKey(t) match {
    case Some(Seq(k)) =>
      backend.schema(t).fields.find(_.name == k).map(_.dataType) match {
        case Some(org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
                  org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType) =>
          Some(k)
        case _ => None
      }
    case _ => None
  }

  /** Disjoint key-range partition SQLs on table `t`'s key under
    * `probeWhere`, one query per range via `mkSql`.
    *
    * DENSE keys (value span within 10× the row count) take a single
    * COUNT/MIN/MAX probe and uniform value strides — Spark's own JDBC
    * strategy, and the reference's spirit. SPARSE keys are where that
    * strategy collapses: a table keyed by, say, snowflake ids spanning
    * 2^40 values piles every row into one or two strides and leaves the
    * rest empty. Those instead probe the ACTUAL key quantiles — one
    * `ORDER BY k OFFSET i·per FETCH 1` per interior boundary, an index
    * seek on any real RDBMS's unique key — and slice [q_i, q_{i+1})
    * between them: balanced partitions under ANY key distribution, at
    * the price of numPartitions-1 scalar probes at planning. */
  private def keyRangeSqls(t: String, k: String, probeWhere: String,
      mkSql: String => String): Seq[String] = {
    val bounds = backend.executeSql(
      s"SELECT COUNT(${q(k)}), MIN(${q(k)}), MAX(${q(k)}) FROM ${q(t)}$probeWhere").head
    if (bounds.isNullAt(1)) Seq(baseSql) // empty table (or all-NULL keys)
    else {
      // BigInt arithmetic: hi - lo on sentinel-valued Long keys
      // overflows and would silently plan zero partitions
      val n = BigInt(bounds.get(0).asInstanceOf[Number].longValue)
      val lo = BigInt(bounds.get(1).asInstanceOf[Number].longValue)
      val hi = BigInt(bounds.get(2).asInstanceOf[Number].longValue)
      val sparse = (hi - lo + 1) > n * 10
      if (!sparse) {
        val stride = ((hi - lo) / numPartitions + 1) max BigInt(1)
        val nParts = (((hi - lo) / stride) + 1).toInt
        (0 until nParts).map { i =>
          val from = lo + stride * i
          val until = from + stride
          // SQL UNIQUE permits NULLs and a NULL key matches no range
          // predicate — partition 0 sweeps them up
          val nulls = if (i == 0) s" OR ${q(k)} IS NULL" else ""
          mkSql(s"(${q(k)} >= $from AND ${q(k)} < $until$nulls)")
        }
      } else {
        val per = (n + numPartitions - 1) / numPartitions
        // probes exclude NULL keys explicitly: COUNT(k) counted only
        // non-nulls, and dialects disagree on where NULLs sort
        val pw = if (probeWhere.isEmpty) s" WHERE ${q(k)} IS NOT NULL"
          else s"$probeWhere AND ${q(k)} IS NOT NULL"
        val cuts = (1 until numPartitions)
          .map(i => BigInt(i) * per).filter(_ < n)
          .map { off =>
            BigInt(backend.executeSql(
              s"SELECT ${q(k)} FROM ${q(t)}$pw ORDER BY ${q(k)}" +
                backend.dialect.limitOffset(Some(1L), Some(off.toLong)))
              .head.get(0).asInstanceOf[Number].longValue)
          }.distinct // duplicate quantiles (heavy keys) collapse a cut
        val edges: Seq[(Option[BigInt], Option[BigInt])] =
          ((None +: cuts.map(Some(_))) :+ None).sliding(2).map {
            pair => (pair.head, pair.last)
          }.toSeq
        edges.zipWithIndex.map { case ((from, until), i) =>
          val range = (from.map(f => s"${q(k)} >= $f"),
              until.map(u => s"${q(k)} < $u")) match {
            case (Some(l), Some(h)) => s"$l AND $h"
            case (Some(l), None) => l
            case (None, Some(h)) => h
            case (None, None) => s"${q(k)} IS NOT NULL" // single cutless range
          }
          val nulls = if (i == 0) s" OR ${q(k)} IS NULL" else ""
          mkSql(s"($range$nulls)")
        }
      }
    }
  }

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = planned

  // cached so Spark's repeated planInputPartitions calls and the reader
  // factory's prefetch see the SAME partitions (stable fetch ids);
  // invalidated by `filter` when a runtime predicate narrows the scan
  @volatile private var plannedCache: Array[InputPartition] = _
  private def planned: Array[InputPartition] = {
    val cached = plannedCache
    if (cached != null) cached
    else synchronized {
      if (plannedCache == null) plannedCache = planPartitions()
      plannedCache
    }
  }

  private def planPartitions(): Array[InputPartition] = {
    // Split strategy, in preference order — every branch is exactly-once,
    // and the one planning round-trip (a scalar probe) is the only backend
    // work before execution (partitions carry SQL text, never rows;
    // reference `PostgresExec::execute` likewise defers each fetch):
    //
    //  1. Declared single integral unique key → COUNT/MIN/MAX probe +
    //     disjoint key-range predicates (the strategy of Spark's own JDBC
    //     partitioning): index-friendly range seeks on a real RDBMS, no
    //     backend sorts. Where Spark's JDBC source stops — uniform value
    //     strides skew under sparse keys — a key whose span exceeds 10×
    //     the row count switches to probed QUANTILE boundaries
    //     (keyRangeSqls): balanced partitions under any distribution.
    //  2. Composite / non-integral key → COUNT probe + key-ordered
    //     LIMIT/OFFSET ranges (the reference's split, made deterministic:
    //     its unordered LIMIT/OFFSET can duplicate or drop rows). Costs
    //     one backend sort per partition query.
    //  3. Single partition (explicit limit, numPartitions <= 1, or empty).
    lazy val probeWhere =
      if (renderedFilters.isEmpty) ""
      else " WHERE " + renderedFilters.mkString(" AND ")
    val sqls: Seq[String] =
      // top-N / offset scans are single-partition by construction: the
      // global ORDER BY/OFFSET only means anything in one backend query
      if (numPartitions <= 1 || limit.isDefined || offset.isDefined ||
          orderBy.nonEmpty) Seq(baseSql)
      else if (joinedFrom.isDefined) joinSplit match {
        // a pushed join parallelizes by slicing ONE base table INSIDE the
        // join fragment (innermost left for INNER/LEFT, right for RIGHT)
        // — each slice joins independently against the full other side,
        // so the union of disjoint slices is exactly the join. The probe
        // runs under that table's own pushed filters (outer/runtime
        // filters apply per partition at the outer level via sqlWith).
        // The reference's whole-query DatabaseExec stayed single-stream
        // here (src/physical_plan.rs:28-132).
        case Some(js) =>
          val pw = if (js.probePreds.isEmpty) ""
            else " WHERE " + js.probePreds.mkString(" AND ")
          rangeKeyOf(js.probeTable) match {
            case Some(k) =>
              keyRangeSqls(js.probeTable, k, pw,
                pred => sqlWith(None, Some(js.mkPred(pred))))
            case None =>
              // keyless probe side: deterministic ORDER BY + OFFSET/FETCH
              // windows at the innermost-subquery level. Sort columns are
              // the declared unique key if any, else EVERY base column —
              // all in scope at that level whether projected or not
              // (unlike the plain-scan fallback below, which sorts the
              // outer projected level), and the table-qualified spelling
              // can never be captured by a side alias. Ties are then
              // full-row duplicates, whose window assignment is
              // interchangeable: the joined multiset stays exact.
              val n = backend.executeSql(
                s"SELECT COUNT(*) FROM ${q(js.probeTable)}$pw")
                .head.get(0).asInstanceOf[Number].longValue
              if (n == 0) Seq(baseSql)
              else {
                val per = (n + numPartitions - 1) / numPartitions
                val orderCols = backend.uniqueKey(js.probeTable)
                  .getOrElse(backend.schema(js.probeTable).fieldNames.toSeq)
                val order = " ORDER BY " +
                  orderCols.map(c => s"${q(js.probeTable)}.${q(c)}").mkString(", ")
                (0L until numPartitions.toLong)
                  .filter(i => i * per < n)
                  .map(i => sqlWith(None, Some(js.mkSuffix(
                    order + backend.dialect.limitOffset(Some(per), Some(i * per))))))
              }
          }
        case None => Seq(baseSql)
      }
      else rangeKeyOf(table) match {
        case Some(k) =>
          // the probe shares the pushed filters, so the bounds (and hence
          // the ranges) reflect the filtered data, not the whole table
          keyRangeSqls(table, k, probeWhere, pred => sqlWith(Some(pred)))
        case None =>
          // Number, not getLong: COUNT's result type is dialect-specific
          // (Derby says INTEGER, most others BIGINT)
          val n = backend.executeSql(
            s"SELECT COUNT(*) FROM ${q(table)}$probeWhere")
            .head.get(0).asInstanceOf[Number].longValue
          if (n == 0) Seq(baseSql)
          else {
            val per = (n + numPartitions - 1) / numPartitions
            // ORDER BY must sit on the SAME query level as the row
            // selection — an ORDER BY inside a derived table is not
            // guaranteed to survive to the outer OFFSET/FETCH, and N
            // independently-unordered windows drop/duplicate rows. The
            // outer level only sees the projected columns, so the sort
            // key is the unique key IF fully projected, else EVERY
            // projected column (ties are then byte-identical rows, which
            // are interchangeable across windows — the multiset union
            // stays exact).
            val projected = required.fieldNames.toSet
            val orderCols = backend.uniqueKey(table)
              .filter(_.forall(projected.contains))
              .getOrElse(required.fieldNames.toSeq)
            if (orderCols.isEmpty) Seq(baseSql) // no columns: single stream
            else {
              val order = " ORDER BY " + orderCols.map(q).mkString(", ")
              (0L until numPartitions.toLong)
                .filter(i => i * per < n)
                .map(i => s"SELECT * FROM ($baseSql) graft_part$order" +
                  backend.dialect.limitOffset(Some(per), Some(i * per)))
            }
          }
      }
    val parts = sqls.map(sql =>
      GraftInputPartition(FetchRegistry.nextId(), sql, required): InputPartition)
      .toArray
    // Runtime-filter re-planning can run AFTER a reader factory was vended
    // (Spark consults createReaderFactory during physical planning, e.g.
    // for columnar checks, which is where the in-process double issues its
    // driver-side prefetches). A re-plan mints fresh fetch ids, so the new
    // generation must be prefetched too — still on the driver, still
    // before any task launches — or tasks would miss the prefetch buffer
    // and enter the deadlock-prone task-side fetch path.
    if (factoryVended) {
      val conn = backend.connection
      parts.foreach {
        case gp: GraftInputPartition => conn.prefetch(gp.fetchId, gp.sql, gp.schema)
      }
      conn.awaitPrefetched()
    }
    parts
  }

  @volatile private var factoryVended = false

  override def createReaderFactory(): PartitionReaderFactory = {
    factoryVended = true
    // Driver-side prefetch hook, issued AFTER partition planning but BEFORE
    // the engine job submits any task: in-process backends (the test
    // double) answer queries with Spark jobs on the engine's own scheduler,
    // and a fetch issued from a running task would deadlock local mode —
    // blocked scan tasks hold every slot the backend job needs. Production
    // JDBC connections leave prefetch a no-op and stream executor-side.
    val conn = backend.connection
    planned.foreach {
      case gp: GraftInputPartition => conn.prefetch(gp.fetchId, gp.sql, gp.schema)
    }
    conn.awaitPrefetched()
    new GraftReaderFactory(conn)
  }
}

/** One partition = one backend SQL query. Rows are fetched by the reader on
  * the task at read time — never materialized at planning or carried in the
  * serialized partition. `fetchId` keys the driver-prefetch handoff for
  * in-process backends ([[FetchRegistry]]). */
case class GraftInputPartition(fetchId: Long, sql: String, schema: StructType)
    extends InputPartition

class GraftReaderFactory(connection: SqlConnection)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftInputPartition]
    new PartitionReader[InternalRow] {
      private val serializer = ExpressionEncoder(RowEncoder.encoderFor(gp.schema))
        .createSerializer()
      // lazy: the backend round-trip happens on first next(), on the task
      private var it: Iterator[Row] = _
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (it == null) it = connection.fetch(gp.fetchId, gp.sql, gp.schema)
        if (it.hasNext) { current = serializer(it.next()).copy(); true } else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** sources.Filter → SQL rendering with per-backend dialect — the analog of
  * the reference's `expr_to_sql` filter rendering (`src/parser.rs:945-1095`)
  * plus its pushdown classifier: None = not renderable = keep in Spark. */
object FilterSql {
  import graft.plans.SqlGen.Dialect

  /** Scalar value → SQL literal; None = no portable rendering (keep the
    * predicate in Spark / reject the row). Shared by filter pushdown and
    * the INSERT writer; temporal forms come from the dialect (Derby has no
    * ANSI typed literals). */
  def literal(v: Any, d: Dialect): Option[String] = v match {
      case null => Some("NULL")
      // backslashes are interpreted as escapes by the Spark dialect but
      // not by ANSI backends; refusing keeps the filter as a Spark
      // residual instead of an Exact-pushed wrong answer (same guard
      // style as likeSafe)
      case s: String if s.contains("\\") => None
      case s: String => Some("'" + s.replace("'", "''") + "'")
      case s: org.apache.spark.unsafe.types.UTF8String if s.toString.contains("\\") => None
      case s: org.apache.spark.unsafe.types.UTF8String =>
        Some("'" + s.toString.replace("'", "''") + "'")
      case b: Boolean => Some(if (b) "TRUE" else "FALSE")
      // non-finite floats have no portable SQL literal (bare NaN/Infinity
      // doesn't parse); keep those predicates in Spark
      case f: Float if f.isNaN || f.isInfinite => None
      case d: Double if d.isNaN || d.isInfinite => None
      case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double) =>
        Some(n.toString)
      case dec: java.math.BigDecimal => Some(dec.toPlainString)
      case dec: scala.math.BigDecimal => Some(dec.bigDecimal.toPlainString)
      // rendered as UTC wall-clock: both our sessions and the backend
      // double pin spark.sql.session.timeZone=UTC (and build.sbt pins the
      // JVM tz), so the literal round-trips exactly
      case t: java.sql.Timestamp => Some(d.timestampLit(utcWallClock(t.toInstant)))
      case t: java.time.Instant => Some(d.timestampLit(utcWallClock(t)))
      // TimestampNTZ external type: already a wall-clock, no zone shift
      case t: java.time.LocalDateTime => Some(d.timestampLit(ntzFmt.format(t)))
      case dt: java.sql.Date => Some(d.dateLit(dt.toString))
      case dt: java.time.LocalDate => Some(d.dateLit(dt.toString))
      case _ => None
    }

  def render(f: Filter, d: Dialect): Option[String] = {
    def lit(v: Any): Option[String] = literal(v, d)
    def like(attr: String, pattern: String): String =
      s"${d.quote(attr)} LIKE '${pattern.replace("'", "''")}'"

    f match {
      case sources.EqualTo(a, v) => lit(v).map(l => s"${d.quote(a)} = $l")
      case sources.EqualNullSafe(a, v) if d.supportsNullSafeEq =>
        lit(v).map(l => s"${d.quote(a)} IS NOT DISTINCT FROM $l")
      case sources.EqualNullSafe(_, _) => None // residual on this backend
      case sources.GreaterThan(a, v) => lit(v).map(l => s"${d.quote(a)} > $l")
      case sources.GreaterThanOrEqual(a, v) => lit(v).map(l => s"${d.quote(a)} >= $l")
      case sources.LessThan(a, v) => lit(v).map(l => s"${d.quote(a)} < $l")
      case sources.LessThanOrEqual(a, v) => lit(v).map(l => s"${d.quote(a)} <= $l")
      case sources.In(_, vs) if vs.isEmpty =>
        // `IN ()` is not SQL; Catalyst's In over an empty list is false
        // (runtime pruning can legitimately produce an empty key set)
        Some(d.falseLit)
      case sources.In(a, vs) =>
        val ls = vs.toSeq.map(lit)
        if (ls.forall(_.isDefined))
          Some(s"${d.quote(a)} IN (${ls.flatten.mkString(", ")})")
        else None
      case sources.IsNull(a) => Some(s"${d.quote(a)} IS NULL")
      case sources.IsNotNull(a) => Some(s"${d.quote(a)} IS NOT NULL")
      case sources.And(l, r) =>
        for { ls <- render(l, d); rs <- render(r, d) } yield s"($ls AND $rs)"
      case sources.Or(l, r) =>
        for { ls <- render(l, d); rs <- render(r, d) } yield s"($ls OR $rs)"
      case sources.Not(c) => render(c, d).map(s => s"(NOT $s)")
      // LIKE escape syntax is dialect-divergent; patterns whose literal
      // part contains metacharacters stay in Spark (residual) instead of
      // guessing the backend's escape rules
      case sources.StringStartsWith(a, v) if likeSafe(v) => Some(like(a, v + "%"))
      case sources.StringEndsWith(a, v) if likeSafe(v) => Some(like(a, "%" + v))
      case sources.StringContains(a, v) if likeSafe(v) => Some(like(a, "%" + v + "%"))
      case sources.AlwaysTrue() => Some(d.trueLit)
      case sources.AlwaysFalse() => Some(d.falseLit)
      case _ => None // e.g. nested-column predicates: residual in Spark
    }
  }

  private[sources] def likeSafe(s: String): Boolean =
    !s.exists(c => c == '%' || c == '_' || c == '\\' || c == '\'')

  private val utcFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)
  private def utcWallClock(i: java.time.Instant): String = utcFmt.format(i)
  private val ntzFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
}
