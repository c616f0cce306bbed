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

  test("allowlist names only live entries") {
    // a stale allowlist hides future regressions under a dead name
    val live = SparkEntry.queries.keySet
    val dead = PlanAudit.allowNestedLoop.filterNot(live.contains)
    assert(dead.isEmpty, s"allowlist entries with no live query: $dead")
  }
}
