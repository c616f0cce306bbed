package graft

import org.scalatest.funsuite.AnyFunSuite

/** The one-call bootstrap must yield a session that answers corpus SQL and
  * carries the pushdown rule. (Reuses the shared test session's JVM; the
  * builder returns the existing session with configs applied, which is
  * exactly the getOrCreate contract users hit.) */
class EngineSpec extends AnyFunSuite {

  test("Engine.create + attach answers SQL over the registered catalog") {
    val spark = Engine.create(master = "local[4]")
    Engine.attach(spark, TestSpark.Sf0001)
    val n = spark.sql(
      "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity > 0").collect()(0).getLong(0)
    assert(n > 0)
    assert(spark.experimental.extraOptimizations.contains(graft.plans.SqlPushdownRule))
  }

  test("attach also wires the catalog-qualified namespace") {
    val spark = Engine.create(master = "local[4]")
    Engine.attach(spark, TestSpark.Sf0001)
    val n = spark.sql(
      "SELECT COUNT(*) AS n FROM graft_db.main.region").collect()(0).getLong(0)
    assert(n == 5)
  }

  test("the product-default config answers a catalog join+aggregate correctly") {
    // s31's shape under Engine.create's defaults: DSv2 join pushdown ON
    // (the engine enables it) coexisting with the whole-plan SqlPushdownRule
    val spark = Engine.create(master = "local[4]")
    Engine.attach(spark, TestSpark.Sf0001)
    assert(spark.conf.get("spark.sql.optimizer.datasourceV2JoinPushdown") == "true")
    val got = spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        |FROM graft_db.main.lineitem JOIN graft_db.main.orders
        |  ON l_orderkey = o_orderkey
        |WHERE l_shipdate > TIMESTAMP '1995-01-01 00:00:00'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
    val o = Tables.load(spark, TestSpark.Sf0001, "orders")
    import org.apache.spark.sql.functions._
    val want = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want && got.nonEmpty)
  }
}
