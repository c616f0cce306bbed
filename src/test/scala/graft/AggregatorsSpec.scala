package graft

import graft.functions.Aggregators
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weighted average matches hand computation and survives repartitioning") {
    val ds = Seq((10.0, 1.0), (20.0, 3.0), (30.0, 1.0)).toDS()
    val expected = (10.0 * 1 + 20.0 * 3 + 30.0 * 1) / 5.0
    val got = ds.select(Aggregators.WeightedAvg.toColumn).head()
    assert(math.abs(got - expected) < 1e-12)
    // partial+final must agree regardless of partitioning
    val got8 = ds.repartition(8).select(Aggregators.WeightedAvg.toColumn).head()
    assert(math.abs(got8 - expected) < 1e-12)
  }

  test("geometric mean on typed column, ignores non-positive values") {
    val ds = Seq(1.0, 10.0, 100.0, 0.0, -5.0).toDS()
    val got = ds.select(Aggregators.GeometricMean.toColumn).head()
    assert(math.abs(got - 10.0) < 1e-9) // gm(1, 10, 100) = 10
  }

  test("approx_count_distinct is within the 5% tolerance of the exact count") {
    val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx $approx vs exact $exact")
    val pApprox = li.select(percentile_approx(col("l_quantity"), lit(0.5), lit(10000)))
      .head().getDouble(0)
    val pExact = li.select(median(col("l_quantity"))).head().getDouble(0)
    assert(math.abs(pApprox - pExact) / math.max(pExact, 1e-9) <= 0.05)
  }
}
