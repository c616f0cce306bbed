package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + invariant tests for the relational corpus on sf0.001.
  * Full value-level correctness is the DuckDB oracle diff (driver gate +
  * tools/oracle_diff.py); these specs pin structural invariants so a
  * refactor that breaks a query shape fails fast in `sbt test`. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001)

  test("every declared query runs and respects its declared columns") {
    val expectedCols = Map(
      "s01_pricing_summary" -> Seq("l_returnflag", "l_linestatus", "sum_qty",
        "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty",
        "avg_price", "avg_disc", "count_order"),
      "s02_shipping_priority" -> Seq("l_orderkey", "revenue", "o_orderdate"),
      "s11_global_sales" -> Seq("cntrycode", "numcust", "totacctbal"),
      "s17a_rank" -> Seq("p_brand", "p_partkey", "p_retailprice", "price_rank", "rn"),
    )
    expectedCols.foreach { case (name, cols) =>
      assert(run(name).columns.toSeq == cols, s"columns of $name")
    }
  }

  test("entry() returns non-empty flagship result") {
    assert(SparkEntry.entry(spark).count() == 6)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query impl: $missing")
  }

  test("s01 aggregates are internally consistent (avg * count == sum)") {
    val rows = run("s01_pricing_summary").collect()
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val avgQty = r.getAs[Double]("avg_qty")
      val n = r.getAs[Long]("count_order")
      assert(math.abs(sumQty - avgQty * n) < 1e-6)
    }
  }

  test("s08 left join keeps customers without orders") {
    val total = run("s08_customer_distribution")
      .agg(org.apache.spark.sql.functions.sum("custdist")).collect()(0).getLong(0)
    assert(total == Tables.load(spark, TestSpark.Sf0001, "customer")
      .select("c_custkey").distinct().count())
  }

  test("s15b intersect result is contained in both inputs") {
    val nk = run("s15b_intersect").collect().map(_.getInt(0)).toSet
    val cust = Tables.load(spark, TestSpark.Sf0001, "customer")
      .select("c_nationkey").collect().map(_.getInt(0)).toSet
    val supp = Tables.load(spark, TestSpark.Sf0001, "supplier")
      .select("s_nationkey").collect().map(_.getInt(0)).toSet
    assert(nk.subsetOf(cust) && nk.subsetOf(supp))
  }

  test("s19 offset skips exactly 10 rows of the same ordering") {
    val all = SparkEntry.queries("s19_null_ordering")(spark, TestSpark.Sf0001)
    assert(all.count() == 50)
  }

  test("streaming hourly equals batch hourly (same oracle)") {
    val streamed = run("stream_hourly").collect().map(_.toString).toSeq
    val batch = run("s23a_events_hourly").collect().map(_.toString).toSeq
    assert(streamed == batch)
  }

  test("streaming sessionization equals batch window-function sessionization") {
    val streamed = run("stream_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = run("s23b_sessionization").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed == batch)
  }
}
