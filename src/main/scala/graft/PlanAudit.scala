package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic: sweeps every batch entry's physical plan for scale
  * antipatterns — nested-loop/cartesian joins where none are intended,
  * scans with no pushed filters, collapsed whole-stage-codegen coverage —
  * and prints a compact per-query report plus a flagged summary.
  * (Streaming entries are excluded: they execute on start, not plan-only.)
  *
  * The sweep itself is a library call so the TEST SUITE gates on it
  * ([[PlanAuditSpec]] asserts zero flags): a new entry that plans a
  * non-allowlisted nested loop fails `sbt test`, not just a manually-run
  * audit binary.
  */
object PlanAudit {
  // intentional exceptions: s20 IS a cross join; s11/s14 use scalar
  // subqueries that Spark plans via broadcast nested loop by design;
  // the ANN brute/IVF/quantized scans cross the corpus with a broadcast
  // of a tiny query/centroid set — the designed one-scan plan, not an
  // accident (sim_topk_ivf_quantized does it twice: centroid assignment
  // and probe scan)
  private[graft] val allowNestedLoop = Set("s20_cross_join", "s11_global_sales",
    "s14_small_qty_revenue", "sim_topk_brute", "sim_topk_ivf",
    "sim_topk_quantized", "sim_topk_ivf_quantized",
    // trained-quantizer IVF: corpus × broadcast(centroids) assignment and
    // query × broadcast(centroids) probe — the designed one-scan plans
    "sim_topk_ivf_kmeans")

  /** Plan every batch entry against `dir`; returns (per-query report
    * lines, flagged antipatterns). Clears the session cache between
    * entries (the dedup pipelines persist intermediates). */
  def sweep(spark: SparkSession, dir: String): (Seq[String], Seq[String]) = {
    val skip = graft.streaming.EventStreams.entries.map(_._1).toSet
    var report = List.empty[String]
    var flagged = List.empty[String]
    for (name <- SparkEntry.queries.keys.toSeq.sorted if !skip(name)) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)"
          .r.findAllIn(plan).toSeq.groupBy(identity)
          .map { case (k, v) => s"$k x${v.size}" }.mkString(", ")
        val scans = plan.split('\n').count(_.contains("FileScan"))
        val exchanges = plan.split('\n').count(_.contains("Exchange"))
        val wsc = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
        report ::= s"== $name: scans=$scans exchanges=$exchanges wholestage=$wsc joins=[$joins]"
        val badJoin = (plan.contains("BroadcastNestedLoopJoin") ||
          plan.contains("CartesianProduct")) && !allowNestedLoop(name)
        if (badJoin) flagged ::= s"$name: nested-loop/cartesian join"
      } catch {
        case e: Exception => flagged ::= s"$name: PLAN ERROR ${e.getMessage}"
      }
      spark.sharedState.cacheManager.clearCache()
    }
    (report.reverse, flagged.reverse)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // static plans: an unexecuted AdaptiveSparkPlan prints the
      // pre-codegen initial plan, hiding WholeStageCodegen spans
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val (report, flagged) = sweep(spark, dir)
    report.foreach(println)
    println(if (flagged.isEmpty) "AUDIT CLEAN"
      else "FLAGGED:\n" + flagged.mkString("\n"))
    spark.stop()
  }
}
