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

  test("SpaceSaving exact regime equals GROUP BY counts at any partitioning") {
    // skewed stream: item i appears 2^(9-i) times, i = 0..9 (N = 1023)
    val data = (0 until 10).flatMap(i => Seq.fill(1 << (9 - i))(s"w$i"))
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ds = scala.util.Random.shuffle(data).toDS()
    for (parts <- Seq(1, 7)) {
      val got = ds.repartition(parts)
        .select(new Aggregators.FrequentItems(10, 64).toColumn)
        .head()
      assert(got.map(c => c.item -> c.cnt).toMap == truth)
      assert(got.forall(_.err == 0L), "exact regime must report zero error")
      // deterministic order: (cnt desc, item asc)
      assert(got.map(_.item) == (0 until 10).map(i => s"w$i"))
    }
  }

  test("SpaceSaving approximate regime keeps its error bounds and hitters") {
    // 8 heavy items (200 each) + 600 singleton stragglers, capacity 32:
    // eviction churn is constant, heavy items must all survive
    val heavy = (0 until 8).flatMap(i => Seq.fill(200)(s"H$i"))
    val noise = (0 until 600).map(i => s"z%03d".format(i))
    val data = scala.util.Random.shuffle(heavy ++ noise)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    val cap = 32
    val got = data.toDS().repartition(4)
      .select(new Aggregators.FrequentItems(16, cap).toColumn)
      .head()
    // SpaceSaving guarantees: true <= cnt and cnt - err <= true; any item
    // with true frequency > N/cap must be retained (here 200 >> 2200/32)
    got.foreach { c =>
      val t = truth.getOrElse(c.item, 0L)
      assert(c.cnt >= t, s"${c.item}: underestimate ${c.cnt} < $t")
      assert(c.cnt - c.err <= t,
        s"${c.item}: lower bound ${c.cnt - c.err} exceeds true $t")
    }
    val kept = got.map(_.item).toSet
    (0 until 8).foreach(i => assert(kept.contains(s"H$i"),
      s"heavy item H$i evicted — frequency guarantee broken"))
  }
}
