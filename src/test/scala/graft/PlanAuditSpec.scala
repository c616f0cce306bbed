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
    val dead = PlanAudit.shuffleBudgets.keySet.filterNot(live.contains)
    assert(dead.isEmpty, s"budgeted entries with no live query: $dead")
  }

  test("allowlist names only live entries") {
    // a stale allowlist hides future regressions under a dead name
    val live = SparkEntry.queries.keySet
    val dead = PlanAudit.allowNestedLoop.filterNot(live.contains)
    assert(dead.isEmpty, s"allowlist entries with no live query: $dead")
  }
}
