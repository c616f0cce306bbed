package graft

import graft.plans.SqlGen
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the plan→SQL generator (the SURVEY §7.2 M3 promise):
  * for RANDOM filter/projection/sort/limit compositions, the generated SQL
  * re-executed by Spark must reproduce the exact result — or SqlGen must
  * return Left (unsupported). The contract under test is "never
  * mistranslate": wrong answers are failures, refusals are not (but a
  * refusal rate of 100% would make the property vacuous, so it is bounded
  * too). */
class SqlGenPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def orders: DataFrame = {
    Tables.registerAll(spark, TestSpark.Sf0001)
    spark.table("orders")
  }

  private val numCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
  private val strCols = Seq("o_orderstatus", "o_orderpriority")

  private val numOps: Seq[(Column, Column) => Column] = Seq(
    (a, b) => a > b, (a, b) => a < b, (a, b) => a >= b,
    (a, b) => a <= b, (a, b) => a === b, (a, b) => a =!= b)
  private val strOps: Seq[(Column, Column) => Column] = Seq(
    (a, b) => a === b, (a, b) => a =!= b, (a, b) => a < b)

  private val genNumPred: Gen[Column] = for {
    c <- Gen.oneOf(numCols)
    v <- Gen.choose(0.0, 300000.0)
    op <- Gen.oneOf(numOps)
  } yield op(col(c), lit(v))

  private val genStrPred: Gen[Column] = for {
    c <- Gen.oneOf(strCols)
    v <- Gen.oneOf("O", "F", "P", "1-URGENT", "3-MEDIUM", "no such value")
    op <- Gen.oneOf(strOps)
  } yield op(col(c), lit(v))

  private val genLeafPred: Gen[Column] = Gen.oneOf(
    genNumPred, genStrPred,
    Gen.oneOf(numCols ++ strCols).map(c => col(c).isNull),
    Gen.oneOf(numCols ++ strCols).map(c => col(c).isNotNull),
    Gen.oneOf(numCols).map(c => col(c).between(1000, 100000)),
    Gen.oneOf(strCols).map(c => col(c).isin("O", "F", "1-URGENT")))

  private def genPred(depth: Int): Gen[Column] =
    if (depth <= 0) genLeafPred
    else Gen.frequency(
      3 -> genLeafPred,
      2 -> (for { a <- genPred(depth - 1); b <- genPred(depth - 1) } yield a && b),
      2 -> (for { a <- genPred(depth - 1); b <- genPred(depth - 1) } yield a || b),
      1 -> genPred(depth - 1).map(!_))

  private val genComputed: Gen[Column] = Gen.oneOf(
    (col("o_totalprice") * 2 + col("o_custkey")).as("calc"),
    (col("o_orderkey") % 7).as("mod7"),
    when(col("o_orderstatus") === "O", 1).otherwise(0).as("flag"),
    coalesce(col("o_orderpriority"), lit("none")).as("prio"),
    upper(col("o_orderstatus")).as("ustat"))

  private case class Shape(pred: Column, baseCols: Seq[String],
      computed: Option[Column], sorted: Boolean, limit: Option[Int])

  private val genShape: Gen[Shape] = for {
    pred <- genPred(2)
    base <- Gen.someOf(numCols.tail ++ strCols)
    computed <- Gen.option(genComputed)
    sorted <- Gen.oneOf(true, false)
    lim <- Gen.option(Gen.choose(1, 80))
  } yield Shape(pred, "o_orderkey" +: base.toSeq, computed, sorted,
    if (sorted) lim else None) // LIMIT without a total order is nondeterministic

  private def build(s: Shape): DataFrame = {
    var df = orders.filter(s.pred)
      .select(s.baseCols.map(col) ++ s.computed.toSeq: _*)
    // o_orderkey is unique, so ordered comparison is deterministic
    if (s.sorted) df = df.orderBy(col("o_orderkey").asc)
    s.limit.foreach(n => df = df.limit(n))
    df
  }

  test("random filter/project/sort/limit plans round-trip exactly or refuse") {
    var supported = 0
    var refused = 0
    val prop = Prop.forAll(genShape) { shape =>
      val df = build(shape)
      SqlGen(df.queryExecution.analyzed, dialect = SqlGen.SparkSqlDialect) match {
        case Left(_) => refused += 1; true
        case Right(sql) =>
          supported += 1
          val a = df.collect().map(_.toString).toSeq
          val b = spark.sql(sql).collect().map(_.toString).toSeq
          val ok = if (shape.sorted) a == b else a.sorted == b.sorted
          if (!ok) System.err.println(s"MISTRANSLATION for:\n$sql")
          ok
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
    assert(supported > refused,
      s"property is near-vacuous: $supported supported vs $refused refused")
  }
}
