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
}
