package graft

import graft.plans.SqlGen
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based round-trip for the plan→SQL generator (SURVEY §5c):
  * random project/filter/aggregate/sort/limit plans over the lineitem view
  * must produce SQL whose re-execution yields exactly the original result.
  * (The reference never asserted its generator's output — tests print only,
  * `tests/tpch.rs:33-44`.) */
object SqlGenProps extends Properties("SqlGen") {

  private lazy val spark = TestSpark.spark

  private lazy val lineitem: DataFrame = {
    Tables.registerAll(spark, TestSpark.Sf0001)
    spark.table("lineitem")
  }

  private val numCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val strCols = Seq("l_returnflag", "l_linestatus")

  private val genPredicate: Gen[Column] = for {
    c <- Gen.oneOf(numCols)
    v <- Gen.choose(0.0, 60.0)
    op <- Gen.oneOf[(Column, Double) => Column](
      (x: Column, y: Double) => x < y, (x: Column, y: Double) => x <= y,
      (x: Column, y: Double) => x > y, (x: Column, y: Double) => x >= y,
      (x: Column, y: Double) => x === y, (x: Column, y: Double) => x =!= y,
      // round-5 operator rows: null-safe equality and bitwise over the
      // (integralized) column must round-trip like any comparison
      (x: Column, y: Double) => x <=> y,
      (x: Column, y: Double) => x.cast("long").bitwiseAND(lit(y.toLong)) > 0,
      (x: Column, y: Double) => x.cast("long").bitwiseOR(lit(y.toLong)) =!= 0)
  } yield op(col(c), v)

  private val genStrPredicate: Gen[Column] = for {
    c <- Gen.oneOf(strCols)
    v <- Gen.oneOf("A", "N", "R", "O", "F", "Z")
  } yield col(c) === v

  private case class PlanShape(preds: List[Column], usePredStr: Boolean,
      groupCol: String, aggCol: String, doAgg: Boolean, limit: Int)

  private val genShape: Gen[PlanShape] = for {
    preds <- Gen.listOfN(2, genPredicate)
    strPred <- genStrPredicate
    useStr <- Gen.oneOf(true, false)
    g <- Gen.oneOf(strCols)
    a <- Gen.oneOf(numCols)
    doAgg <- Gen.oneOf(true, false)
    lim <- Gen.choose(1, 50)
  } yield PlanShape(if (useStr) strPred :: preds else preds, useStr, g, a, doAgg, lim)

  property("roundTrip") = forAll(genShape) { shape =>
    val filtered = shape.preds.foldLeft(lineitem)((df, p) => df.filter(p))
    val df =
      if (shape.doAgg)
        filtered.groupBy(col(shape.groupCol))
          .agg(sum(shape.aggCol).as("s"), count(lit(1)).as("n"),
            min(shape.aggCol).as("mn"))
      else
        filtered.select((strCols ++ Seq(shape.aggCol)).map(col).toIndexedSeq: _*)
          .orderBy((strCols ++ Seq(shape.aggCol)).map(col).toIndexedSeq: _*)
          .limit(shape.limit)
    SqlGen(df.queryExecution.analyzed, dialect = SqlGen.SparkSqlDialect) match {
      case Left(u) => throw new AssertionError(s"SqlGen failed: $u")
      case Right(sql) =>
        val a = df.collect().map(_.toString).sorted.toSeq
        val b = spark.sql(sql).collect().map(_.toString).sorted.toSeq
        a == b
    }
  }
}
