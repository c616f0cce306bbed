package graft
import org.apache.spark.sql.SparkSession
/** Diagnostic: prints pushdown/join/codegen facts for key corpus plans. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("s01_pricing_summary", "s03_local_supplier_volume", "s04_forecast_revenue", "s10_large_orders")) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan).mkString(" | ")
      val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)".r.findAllIn(plan).toSeq.groupBy(identity).map{case(k,v)=>s"$k x${v.size}"}.mkString(", ")
      val scans = plan.split('\n').count(_.contains("FileScan"))
      println(s"== $name: scans=$scans joins=[$joins]")
      println(s"   pushed: ${pushed.take(400)}")
      val wsc = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
      println(s"   wholestage spans: $wsc")
    }
    spark.stop()
  }
}
