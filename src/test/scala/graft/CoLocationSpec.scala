package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-discipline checks: plans must not shuffle more than the
  * operation requires — the property that decides wall-clock at 100 TB. */
class CoLocationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    df.collect() // materialize so AQE finalizes the plan
    def walk(p: SparkPlan): Int = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan) // stages are leaves wrapping their plan
        case other => other.children
      }
      val self = if (p.isInstanceOf[ShuffleExchangeExec]) 1 else 0
      self + kids.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("pre-partitioned join reuses the partitioning instead of re-shuffling") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
        .select(col("l_orderkey"), col("l_quantity")).repartition(8, col("l_orderkey"))
      val o = Tables.load(spark, TestSpark.Sf0001, "orders")
        .select(col("o_orderkey"), col("o_totalprice")).repartition(8, col("o_orderkey"))
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
      // exactly the two explicit repartitions; the join itself adds none
      assert(shuffles(joined) == 2, joined.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("groupBy after repartition on the same key adds no exchange") {
    val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
      .repartition(8, col("l_returnflag"))
    val agg = li.groupBy("l_returnflag").agg(sum("l_quantity"))
    assert(shuffles(agg) == 1, agg.queryExecution.executedPlan.toString)
  }

  test("broadcast join produces no shuffle at all") {
    val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
    val n = Tables.load(spark, TestSpark.Sf0001, "nation")
    val joined = li.join(broadcast(n), col("l_suppkey") % 25 === col("n_nationkey"))
    assert(shuffles(joined) == 0, joined.queryExecution.executedPlan.toString)
  }
}
