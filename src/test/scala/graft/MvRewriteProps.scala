package graft

import graft.plans.MaterializedViews
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the materialized-view rewrite: for RANDOM
  * group-by/aggregate/filter compositions over the base table, the
  * rewritten plan must return the same rows as the unrewritten plan —
  * and whenever the shape is inside the derivable surface, it must
  * actually serve from the view (a rewrite that silently never fires
  * would pass the equality vacuously). */
class MvRewriteProps extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = TestSpark.spark.newSession()
    MaterializedViews.install(s)
    s
  }
  private lazy val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
  private def discPrice =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private lazy val mv = MaterializedViews.ensure(spark, "prop_li", li,
    dims = Seq("l_returnflag", "l_linestatus"),
    measures = Seq("qty" -> col("l_quantity"),
      "price" -> col("l_extendedprice"), "disc_price" -> discPrice))

  private val dims = Seq("l_returnflag", "l_linestatus")

  // (aggregate, derivable?) — the sampler mixes both so the property
  // exercises declines as well as rewrites
  private val aggs: Seq[(Column, Boolean)] = Seq(
    (sum("l_quantity"), true), (sum("l_extendedprice"), true),
    (sum(discPrice), true), (min("l_quantity"), true),
    (max("l_extendedprice"), true), (count(lit(1)), true),
    (avg("l_extendedprice"), true), (count(col("l_quantity")), true),
    (sum(col("l_quantity") * col("l_tax")), false), // unrecorded measure
    (countDistinct(col("l_quantity")), false),      // DISTINCT
    (avg("l_orderkey"), false))                     // non-measure column

  private case class Shape(groupDims: Seq[String], aggIdx: Seq[Int],
      dimFilter: Option[Column], nonDimFilter: Boolean)

  private val genShape: Gen[Shape] = for {
    g <- Gen.someOf(dims)
    n <- Gen.choose(1, 4)
    idx <- Gen.listOfN(n, Gen.choose(0, aggs.size - 1))
    f <- Gen.option(Gen.oneOf(
      col("l_returnflag") === "R",
      col("l_linestatus") =!= "F",
      col("l_returnflag").isin("A", "N")))
    nd <- Gen.frequency(4 -> false, 1 -> true)
  } yield Shape(g.toSeq, idx.distinct, f, nd)

  private def build(t: DataFrame, s: Shape): DataFrame = {
    var df = t
    s.dimFilter.foreach(f => df = df.filter(f))
    if (s.nonDimFilter) df = df.filter(col("l_quantity") > 10)
    val cols = s.aggIdx.zipWithIndex.map { case (i, j) => aggs(i)._1.as(s"a$j") }
    if (s.groupDims.isEmpty) df.agg(cols.head, cols.tail: _*)
    else df.groupBy(s.groupDims.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  private def scansView(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten.forall(_.contains("graft-mv"))

  // compare doubles at RELATIVE precision (10 significant digits):
  // AVG/double-SUM re-association noise scales with the magnitude of the
  // sum, so an absolute epsilon fails on large totals (a ~1e8 SUM of
  // l_extendedprice carries ~1e-4 absolute noise between the view's
  // partial-fold order and the base plan's order)
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case d: Double =>
        val v = if (d == 0.0) 0.0 else d // normalize -0.0
        String.format(java.util.Locale.ROOT, "%.9e", Double.box(v))
      case x => String.valueOf(x)
    }.mkString("|")).sorted.toSeq

  test("random roll-ups equal the base plan and fire exactly when derivable") {
    mv
    // fresh session: the SHARED session may have MvRewriteRule in its
    // extraOptimizations (GraftExtensions.install from another suite) and
    // the view registry is global — the comparand must be unrewritable
    val baseSession = TestSpark.spark.newSession()
    val base = Tables.load(baseSession, TestSpark.Sf0001, "lineitem")
    assert(!scansView(base.groupBy("l_returnflag").agg(sum("l_quantity"))),
      "base comparand itself is served from the view")
    var fired = 0
    var declined = 0
    val prop = Prop.forAll(genShape) { s =>
      val rewritten = build(li, s)
      val expectFire = !s.nonDimFilter && s.aggIdx.forall(aggs(_)._2)
      val servedFromView = scansView(rewritten)
      if (servedFromView) fired += 1 else declined += 1
      val equal = canon(rewritten) == canon(build(base, s))
      if (!equal) System.err.println(s"MISMATCH for $s")
      if (servedFromView != expectFire)
        System.err.println(s"fire=$servedFromView expected=$expectFire for $s")
      equal && servedFromView == expectFire
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(50).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
    assert(fired > 0 && declined > 0,
      s"property is one-sided: fired=$fired declined=$declined")
  }
}
