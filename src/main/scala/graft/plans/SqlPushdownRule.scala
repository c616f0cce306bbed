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

  override def apply(plan: LogicalPlan): LogicalPlan =
    attempt(rewriteFullJoins(plan))

  /** FULL-join decomposition for scan-preferred (remote JDBC) backends:
    *
    *   A FULL JOIN B  =  (A LEFT JOIN B)  ∪ALL  (NULLs ++ (B ANTI A))
    *
    * The reference executed every pushed query single-stream
    * (`src/physical_plan.rs:55-61`); a native FULL fusion would inherit
    * that, and naive key-range slicing is wrong for FULL (either side's
    * unmatched rows would repeat per slice). The decomposition instead
    * hands each half to the machinery that already parallelizes it: the
    * LEFT branch takes DSv2 join pushdown WITH key-range slicing (N
    * partition queries), and the anti branch whole-plan-fuses to one
    * NOT-EXISTS backend query — N + 1 partitions that union to exactly
    * the FULL join. On dialects WITHOUT native FULL JOIN (Derby) this is
    * also what makes a federated FULL join expressible at all. */
  private def rewriteFullJoins(plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.plans.{FullOuter, LeftAnti, LeftOuter}
    import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, Project, Union}
    plan.transformUpWithSubqueries {
      case j @ Join(l, r, FullOuter, Some(cond), hint) if cond.deterministic &&
          backendOf(j).exists(b =>
            b.dialect.fullSqlGen && b.dialect.scanPreferred) =>
        val leftJoin = Join(l, r, LeftOuter, Some(cond), hint)
        val nulls = l.output.map(a => Alias(Literal(null, a.dataType), a.name)())
        val anti = Project(nulls ++ r.output,
          Join(r, l, LeftAnti, Some(cond), JoinHint.NONE))
        // Union resolves output to the head child's attribute ids (the
        // original join's), nullability widened by the NULL branch
        Union(Seq(leftJoin, anti))
    }
  }

  /** The single graft backend behind every leaf of `p`, if there is one. */
  private def backendOf(p: LogicalPlan): Option[SqlBackend] = {
    val leaves = (p +: p.subqueriesAll).flatMap(_.collectLeaves())
    val infos = leaves.flatMap(leafOf)
    if (infos.nonEmpty && infos.size == leaves.size &&
      infos.forall(_._1 eq infos.head._1)) Some(infos.head._1)
    else None
  }

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

  /** For `scanPreferred` (remote JDBC) backends: true when the subtree is
    * within the grammar the DSv2 scan surface already negotiates —
    * project/filter/limit/offset/top-N, basic aggregates, and INNER/LEFT/
    * RIGHT joins (`SupportsPushDownJoin` with parallel key-range splits).
    * Fusing those into a [[PushedSqlQuery]] would trade a partitioned
    * parallel read for a single-stream fetch — a downgrade at scale — so
    * they stay on the scan path. Anything OUTSIDE the grammar (semi/anti
    * joins, set ops, DISTINCT/FILTER/statistical aggregates, windows,
    * subquery expressions) cannot push scan-level at all; for those,
    * computing backend-side and fetching the (reduced) result single-
    * stream moves strictly fewer bytes than fetching every input row. */
  private def scanSurfaceCovers(p: LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{Exists, InSubquery, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
    import org.apache.spark.sql.catalyst.plans.logical._
    def noSubqueryExpr(e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      !e.exists(_.exists {
        case _: Exists | _: InSubquery | _: ScalarSubquery => true
        case _ => false
      })
    def basic(fs: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression]) =
      fs.forall(!_.exists {
        case ae: AggregateExpression =>
          ae.isDistinct || ae.filter.isDefined || !(ae.aggregateFunction match {
            case _: Sum | _: Average | _: Min | _: Max | _: Count => true
            case _ => false
          })
        case _ => false
      })
    p match {
      case Project(l, c) if noSubqueryExpr(l) => scanSurfaceCovers(c)
      case Filter(cond, c) if noSubqueryExpr(Seq(cond)) => scanSurfaceCovers(c)
      case GlobalLimit(_, c) => scanSurfaceCovers(c)
      case LocalLimit(_, c) => scanSurfaceCovers(c)
      case o: Offset => scanSurfaceCovers(o.child)
      case Sort(_, true, c, _) => scanSurfaceCovers(c)
      case SubqueryAlias(_, c) => scanSurfaceCovers(c)
      case Aggregate(g, aggs, c, _)
          if basic(aggs) && !g.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.BaseGroupingSets]) =>
        scanSurfaceCovers(c)
      case Join(l, r, Inner | LeftOuter | RightOuter, _, _) =>
        scanSurfaceCovers(l) && scanSurfaceCovers(r)
      // a Union with ANY scan-expressible branch must not fuse whole —
      // that would downgrade the branch's partitioned parallel read to a
      // slice of a single-stream query; the recursion in [[attempt]]
      // still fuses the non-expressible branches individually (this is
      // what keeps the FULL-join decomposition's LEFT branch parallel)
      case Union(children, false, false) => children.exists(scanSurfaceCovers)
      case _: DataSourceV2Relation | _: DataSourceV2ScanRelation => true
      case _ => false
    }
  }

  /** Root chain is only NON-REDUCING nodes (projections, aliases, global
    * sorts) over a Window (or its group-limit hint): full-cardinality
    * output, nothing reducing — Sort included, or `window().orderBy()`
    * would slip a full-table fusion past the gate (round-12 review). */
  private def bareWindowRoot(p: LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort, SubqueryAlias, Window, WindowGroupLimit}
    p match {
      case Project(_, c) => bareWindowRoot(c)
      case SubqueryAlias(_, c) => bareWindowRoot(c)
      case Sort(_, _, c, _) => bareWindowRoot(c)
      case _: Window => true
      case _: WindowGroupLimit => true
      case _ => false
    }
  }

  /** Known backend-catalog row count of one pushable leaf (the scan's own
    * estimate caps it at a pushed LIMIT), None when the backend has no
    * statistics for it. */
  private def leafRows(p: LogicalPlan): Option[Long] = p match {
    case r: DataSourceV2ScanRelation => r.scan match {
      case g: GraftScan =>
        val s = g.estimateStatistics()
        if (s.numRows().isPresent) Some(s.numRows().getAsLong) else None
      case _ => None
    }
    case r: DataSourceV2Relation => r.table match {
      case t: graft.sources.GraftSqlTable => t.backend.estimatedRowCount(t.tableName)
      case _ => None
    }
    case _ => None
  }

  /** Output-row ESTIMATE of a convertible subtree from backend catalog
    * statistics, with the standard size-only heuristics: filters and
    * windows keep their child's estimate (no selectivity/NDV info),
    * grouped aggregates keep their child's (reduction unprovable without
    * NDV — the gate refuses to gamble a single-stream fetch on it),
    * global aggregates are 1, conditioned joins take the FK-join
    * heuristic max(|l|, |r|), condition-free joins multiply. The join
    * heuristic means this is a best-effort cost model, NOT a strict
    * bound: a many-to-many equi-join multiplies matches and can exceed
    * the estimate arbitrarily — the same blind spot every stats-only
    * planner has without NDV/histogram data, accepted here because the
    * strict alternative (multiplying conditioned joins too) would veto
    * virtually every multi-table fusion the gate exists to permit.
    * None as soon as any leaf or node is unestimable — the caller then
    * falls back to the structural gates alone. */
  private def estimateRows(p: LogicalPlan): Option[BigInt] = {
    import org.apache.spark.sql.catalyst.expressions.IntegerLiteral
    import org.apache.spark.sql.catalyst.plans.{ExistenceJoin, LeftAnti, LeftSemi}
    import org.apache.spark.sql.catalyst.plans.logical._
    def est(q: LogicalPlan): Option[BigInt] = q match {
      case leaf @ (_: DataSourceV2Relation | _: DataSourceV2ScanRelation) =>
        leafRows(leaf).map(BigInt(_))
      case Project(_, c) => est(c)
      case SubqueryAlias(_, c) => est(c)
      case Filter(_, c) => est(c)
      case Sort(_, _, c, _) => est(c)
      case w: Window => est(w.child)
      case wg: WindowGroupLimit => est(wg.child)
      case GlobalLimit(IntegerLiteral(n), c) => est(c).map(_.min(BigInt(n)))
      case LocalLimit(IntegerLiteral(n), c) => est(c).map(_.min(BigInt(n)))
      case o: Offset => est(o.child)
      case Aggregate(g, _, c, _) =>
        if (g.isEmpty) Some(BigInt(1)) else est(c)
      case Distinct(c) => est(c)
      case Deduplicate(_, c) => est(c)
      case Join(l, _, LeftSemi | LeftAnti | _: ExistenceJoin, _, _) => est(l)
      case Join(l, r, _, Some(_), _) =>
        for (a <- est(l); b <- est(r)) yield a.max(b)
      case Join(l, r, _, None, _) =>
        for (a <- est(l); b <- est(r)) yield a * b
      case Union(cs, _, _) =>
        cs.foldLeft(Option(BigInt(0))) { (acc, c) =>
          for (a <- acc; b <- est(c)) yield a + b
        }
      case Intersect(l, r, _) =>
        for (a <- est(l); b <- est(r)) yield a.min(b)
      case Except(l, _, _) => est(l)
      case _ => None
    }
    est(p)
  }

  /** Statistics-gated push-vs-pull — the reference's aspirational cost
    * model ("offline/online gathering of statistics … choosing when to
    * read & compute on DF vs on the DB", `README.md:23`, stubbed there to
    * defaults, `src/physical_plan.rs:96-100`) made operational. A fused
    * query fetches its result through ONE stream; when the estimated
    * result is large, that stream — not the compute — is the bottleneck,
    * and the partitioned scan path + distributed compute wins even though
    * the subtree re-shuffles in Spark. Budget in rows
    * (`spark.graft.fusion.maxFetchRows`, default 5M ≈ seconds of
    * single-stream fetch); unknown estimates keep the structural
    * decision — the grammar gates are already conservative. */
  private def fitsFetchBudget(p: LogicalPlan): Boolean = {
    val raw = conf.getConfString("spark.graft.fusion.maxFetchRows", "5000000")
    val budget =
      try BigInt(raw.trim)
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"spark.graft.fusion.maxFetchRows must be a plain integer row count, got '$raw'")
      }
    require(budget >= 0,
      s"spark.graft.fusion.maxFetchRows must be non-negative, got '$raw'")
    estimateRows(p).forall(_ <= budget)
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
    // dialects the generator can't target at all keep scan-level pushdown
    // only (unrecognized JDBC drivers)
    if (!backend.dialect.fullSqlGen) return None
    // remote backends with partitioned scan reads: fuse only subtrees the
    // scan surface can't express (see scanSurfaceCovers) — fusion there
    // would downgrade a parallel read to a single-stream fetch
    if (backend.dialect.scanPreferred && scanSurfaceCovers(p)) return None
    // same economics for a BARE window root: its output cardinality is
    // its full input, so fusing ships every row through one stream AND
    // serializes the window compute backend-side — strictly worse at
    // scale than the partitioned scan + Spark's distributed window.
    // Window fusion stays worthwhile exactly when something REDUCING
    // (rank filter, limit, aggregate) sits above — and then THAT node
    // roots the attempted subtree, so this gate never fires for it
    // (attempt() walks top-down).
    if (backend.dialect.scanPreferred && bareWindowRoot(p)) return None
    // statistics gate (see fitsFetchBudget): even a reducing, grammar-
    // eligible subtree stays on the partitioned scan path when catalog
    // stats bound its result above the single-stream fetch budget
    if (backend.dialect.scanPreferred && !fitsFetchBudget(p)) return None

    val resolver: SqlGen.TableResolver = pl => leafOf(pl).map(_._2)

    SqlGen(p, resolver, backend.dialect) match {
      case Right(sql) =>
        // a fused WINDOW query over a scan-preferred backend may still get
        // a partitioned parallel read: N disjoint slice queries whose
        // union is the result (see windowSlices)
        val sliceGen =
          if (backend.dialect.scanPreferred) {
            windowSlices(p, resolver, backend).getOrElse(PushedSqlQuery.noSlices)
          } else PushedSqlQuery.noSlices
        Some(PushedSqlQuery(p.output, sql, backend)(sliceGen))
      case Left(why) =>
        if (sys.props.contains("graft.pushdown.debug"))
          System.err.println(s"[pushdown] ${p.nodeName} not converted: $why")
        None
    }
  }

  /** Partitioned parallel reads for FUSED window queries — the capability
    * the single-stream fusion tier traded away, recovered exactly where it
    * is sound: when every window in the fused subtree partitions by one
    * common column that traces UNALIASED to a base-table column on a
    * join-sliceable side, slicing that column into disjoint ranges and
    * running the WHOLE fused query once per range unions to exactly the
    * single-stream result — each window partition (one column value) lies
    * entirely inside one slice, filters and projections distribute over
    * row-disjoint inputs, and a conditioned INNER/LEFT/RIGHT join
    * distributes over slices of its preserved/driving side (the same side
    * rule as the DSv2 join split, `GraftSqlSource.planPartitions`).
    *
    * Declines (returns Nil → single stream, today's behavior) when:
    * subquery expressions are present; any node outside
    * {Project, Filter, SubqueryAlias, Window, WindowGroupLimit,
    * conditioned Inner/Left/Right Join, leaf} appears (a global Sort,
    * Limit, Aggregate, or set-op does NOT distribute over slices); no
    * common bare partition column exists; the column is non-integral or
    * aliased anywhere on its path; or the probe finds no rows.
    *
    * Range construction: one COUNT/MIN/MAX probe on the base table, then
    * uniform value strides with UNBOUNDED outer edges — slice 0 is
    * `col < q1 OR col IS NULL` and the last slice `col >= q_last`, so
    * every value (including NULL window partitions and values outside the
    * probed span) lands in exactly one slice by construction. */
  private def windowSlices(p: LogicalPlan, resolver: SqlGen.TableResolver,
      backend: SqlBackend): Option[() => Seq[String]] = {
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression, GreaterThanOrEqual, IsNull, LessThan, Literal, Or}
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, Project, SubqueryAlias, Window, WindowGroupLimit}
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

    // malformed conf values decline slicing (default 4) instead of
    // throwing NumberFormatException out of the optimizer
    val parts = conf.getConfString("spark.graft.fusion.windowSliceParts", "4")
      .trim.toIntOption.getOrElse(4)
    if (parts <= 1) return None
    if (p.subqueriesAll.nonEmpty) return None

    val partitionSpecs = scala.collection.mutable.ArrayBuffer.empty[Seq[Expression]]
    def allowed(q: LogicalPlan): Boolean = q match {
      case Project(_, c) => allowed(c)
      case Filter(_, c) => allowed(c)
      case SubqueryAlias(_, c) => allowed(c)
      case w: Window => partitionSpecs += w.partitionSpec; allowed(w.child)
      case wg: WindowGroupLimit => partitionSpecs += wg.partitionSpec; allowed(wg.child)
      case Join(l, r, Inner | LeftOuter | RightOuter, Some(_), _) =>
        allowed(l) && allowed(r)
      case _: DataSourceV2Relation | _: DataSourceV2ScanRelation => true
      case _ => false
    }
    if (!allowed(p) || partitionSpecs.isEmpty) return None
    // common BARE partition columns across every window (an aliased or
    // computed partition key has a different ExprId than any leaf output
    // and drops out here — exactly the unaliased-trace requirement)
    val common = partitionSpecs
      .map(_.collect { case a: AttributeReference => a.exprId }.toSet)
      .reduce(_ intersect _)
    if (common.isEmpty) return None

    /** Join-side validity of the path from `q` down to `leaf`: at every
      * join, slicing is sound only on the driving/preserved side. */
    def sliceableSide(q: LogicalPlan, leaf: LogicalPlan): Boolean = {
      def contains(x: LogicalPlan): Boolean = x.collectLeaves().exists(_ eq leaf)
      q match {
        case Project(_, c) => sliceableSide(c, leaf)
        case Filter(_, c) => sliceableSide(c, leaf)
        case SubqueryAlias(_, c) => sliceableSide(c, leaf)
        case w: Window => sliceableSide(w.child, leaf)
        case wg: WindowGroupLimit => sliceableSide(wg.child, leaf)
        case Join(l, r, jt, _, _) =>
          if (contains(l)) (jt == Inner || jt == LeftOuter) && sliceableSide(l, leaf)
          else (jt == Inner || jt == RightOuter) && sliceableSide(r, leaf)
        case _ => q eq leaf
      }
    }

    val target = p.collectLeaves().iterator.flatMap { leaf =>
      leaf.output.collectFirst {
        case a: AttributeReference if common.contains(a.exprId) &&
            (a.dataType match {
              case ByteType | ShortType | IntegerType | LongType => true
              case _ => false
            }) && sliceableSide(p, leaf) => (leaf, a)
      }
    }.nextOption()
    val (leaf, attr) = target.getOrElse(return None)

    // Structurally sliceable. EVERYTHING live — the COUNT/MIN/MAX probe,
    // the sparse-key quantile seeks — is DEFERRED into the returned thunk
    // so the optimizer (and thus EXPLAIN / every re-plan of a reused
    // DataFrame) never queries the backend; PushedSqlExec forces it at
    // execution, memoized per execution instance. Inside the probe half a
    // failure returns Nil = single-stream degradation, today's behavior,
    // decided where the read actually happens.
    val frag = leafOf(leaf).map(_._2).getOrElse(return None)
    Some(() => probeSlices(p, resolver, backend, leaf, attr, frag, parts))
  }

  /** Execution-time half of [[windowSlices]]: the live range probes and
    * slice-SQL rendering, run when [[PushedSqlExec]] first forces its
    * slice list. Nil = degrade to the single stream. */
  private def probeSlices(p: LogicalPlan, resolver: SqlGen.TableResolver,
      backend: SqlBackend, leaf: LogicalPlan,
      attr: org.apache.spark.sql.catalyst.expressions.AttributeReference,
      frag: String, parts: Int): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{And, Expression, GreaterThanOrEqual, IsNull, LessThan, Literal, Or}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

    // COUNT/MIN/MAX probe on the base table's FROM fragment (a plain table
    // name or the scan's negotiated subquery — aliased for dialects that
    // require one)
    val d = backend.dialect
    val qa = d.quote(attr.name)
    val probeAlias = d.quote("__graft_slice_probe")
    val bounds =
      try backend.executeSql(
        s"SELECT COUNT($qa), MIN($qa), MAX($qa) FROM $frag $probeAlias").head
      catch { case _: Exception => return Nil } // probe failure: single stream
    if (bounds.isNullAt(1)) return Nil
    val n = BigInt(bounds.get(0).asInstanceOf[Number].longValue)
    val lo = BigInt(bounds.get(1).asInstanceOf[Number].longValue)
    val hi = BigInt(bounds.get(2).asInstanceOf[Number].longValue)
    // Interior boundaries, each range = [b_i, b_{i+1}) with unbounded
    // outer edges. DENSE values (span within 10× the row count) take
    // uniform strides from one probe — the Spark-JDBC strategy. SPARSE
    // values (snowflake-ish ids) would pile every row into one or two
    // strides, so they probe the ACTUAL column quantiles instead — one
    // ORDER BY k LIMIT 1 OFFSET i·per index seek per interior boundary,
    // the same discipline as the scan path's keyRangeSqls; duplicate
    // quantiles (heavy values) collapse a cut, never split one value
    // across slices.
    val sparse = (hi - lo + 1) > n * 10
    val boundaries: Seq[BigInt] =
      if (!sparse) {
        val stride = ((hi - lo) / parts + 1) max BigInt(1)
        val nParts = (((hi - lo) / stride) + 1).toInt
        (1 until nParts).map(i => lo + stride * i)
      } else {
        val per = (n + parts - 1) / parts
        try (1 until parts).map(i => BigInt(i) * per).filter(_ < n).map { off =>
          BigInt(backend.executeSql(
            s"SELECT $qa FROM $frag $probeAlias WHERE $qa IS NOT NULL ORDER BY $qa" +
              d.limitOffset(Some(1L), Some(off.toLong))).head
            .get(0).asInstanceOf[Number].longValue)
        }.distinct
        catch { case _: Exception => return Nil }
      }
    if (boundaries.isEmpty) return Nil

    def lit(v: BigInt): Literal = attr.dataType match {
      case LongType => Literal(v.toLong)
      case IntegerType => Literal(v.toInt)
      case ShortType => Literal(v.toShort)
      case ByteType => Literal(v.toByte)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    // unbounded outer edges: slice 0 takes everything below b_1 plus NULL
    // keys, the last slice everything at/above its last boundary — total
    // coverage holds even for values outside the probed [lo, hi] span
    val edges: Seq[(Option[BigInt], Option[BigInt])] =
      ((None +: boundaries.map(Option(_))) :+ None).sliding(2)
        .map(pair => (pair.head, pair.last)).toSeq
    val preds: Seq[Expression] = edges.zipWithIndex.map { case ((from, until), i) =>
      val lower = from.map(f => GreaterThanOrEqual(attr, lit(f)))
      val upper = until.map(u => LessThan(attr, lit(u)))
      val range: Expression = (lower, upper) match {
        case (Some(a), Some(b)) => And(a, b)
        case (Some(a), None) => a
        case (None, Some(b)) => b
        case (None, None) => Literal.TrueLiteral
      }
      if (i == 0) Or(range, IsNull(attr)) else range
    }
    val slices = preds.map { pred =>
      val sliced = p.transformUp { case l if l eq leaf => Filter(pred, l) }
      SqlGen(sliced, resolver, d) match {
        case Right(s) => s
        case Left(_) => return Nil // any unrenderable slice: single stream
      }
    }
    slices
  }
}


/** `SparkSessionExtensions` wiring (config
  * `spark.sql.extensions=graft.plans.GraftExtensions`) — analog of
  * `make_rdbms_context` registering planner + optimizer rule
  * (`src/lib.rs:22-32`). For an already-built session use
  * [[GraftExtensions.install]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => MvRewriteRule)
    e.injectOptimizerRule(_ => SqlPushdownRule)
    e.injectPlannerStrategy(_ => PushedSqlStrategy)
  }
}

object GraftExtensions {
  /** A NEW session (sharing the current context) whose optimizer runs the
    * graft rules in the OPERATOR-OPTIMIZATION batch — i.e. before
    * V2ScanRelationPushDown — which [[install]]'s `extraOptimizations`
    * placement cannot do. Required for MV rewrite over federated bases
    * with filters: after pushdown the scan has absorbed them and the
    * rewrite must decline. `getOrCreate` only applies builder extensions
    * to a new session, so the active/default slots are cleared for the
    * call and restored after.
    *
    * CONCURRENCY CAVEAT: the lock below serializes newSession() callers
    * only. An UNRELATED concurrent `SparkSession.builder().getOrCreate()`
    * elsewhere in the process does not take it and can observe the
    * cleared slots (building a session it didn't need) or capture the
    * extensions-laden session as its own default. Fine for the
    * single-threaded entry/test usage this serves; a long-lived
    * multi-tenant process should build its sessions up front instead of
    * interleaving getOrCreate with this call. */
  def newSession(): SparkSession = synchronized {
    // synchronized: the active/default slots are process-global — two
    // concurrent builders interleaving clear/restore would leak the
    // wrong session into one of them
    val active = SparkSession.getActiveSession
    val default = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder()
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    finally {
      // restore EXACTLY the prior state: getOrCreate installed the new
      // session into both slots, so when a slot was previously empty it
      // must be CLEARED, not left pointing at the extension session —
      // otherwise every later plain getOrCreate() in the process would
      // silently inherit the graft optimizer rules
      default match {
        case Some(s) => SparkSession.setDefaultSession(s)
        case None => SparkSession.clearDefaultSession()
      }
      active match {
        case Some(s) => SparkSession.setActiveSession(s)
        case None => SparkSession.clearActiveSession()
      }
    }
  }

  /** Runtime installation on an existing session. */
  def install(spark: SparkSession): Unit = {
    MaterializedViews.install(spark)
    if (!spark.experimental.extraOptimizations.contains(SqlPushdownRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SqlPushdownRule
    if (!spark.experimental.extraStrategies.contains(PushedSqlStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ PushedSqlStrategy
  }
}
