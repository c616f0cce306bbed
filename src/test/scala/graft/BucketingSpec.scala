package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-shuffled on-disk layout so repeated joins/aggregations on
  * the bucket key run with NO exchange at all — the cluster-scale answer to
  * "this join shuffles 100 TB every night". */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def shuffleCount(p: SparkPlan): Int = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    (if (p.isInstanceOf[ShuffleExchangeExec]) 1 else 0) + kids.map(shuffleCount).sum
  }

  test("bucketed tables join and aggregate with zero shuffles") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, TestSpark.Sf0001, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")
      Tables.load(spark, TestSpark.Sf0001, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")

      val joined = spark.table("lineitem_bucketed")
        .join(spark.table("orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      assert(shuffleCount(joined.queryExecution.executedPlan) == 0,
        joined.queryExecution.executedPlan.toString)

      val agg = spark.table("lineitem_bucketed")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      agg.collect()
      assert(shuffleCount(agg.queryExecution.executedPlan) == 0,
        agg.queryExecution.executedPlan.toString)

      // and the result is still correct
      val want = Tables.load(spark, TestSpark.Sf0001, "lineitem")
        .join(Tables.load(spark, TestSpark.Sf0001, "orders")
            .select("o_orderkey", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    }
  }
}
