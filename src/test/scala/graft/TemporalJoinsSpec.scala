package graft

import graft.ops.TemporalJoins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def evs(rows: (Long, String, Long, Double)*) =
    rows.toDF("event_id", "tss", "user_id", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")

  test("asof backward picks the latest right row at or before each left row") {
    val left = evs(
      (1L, "2024-01-01 10:00:00", 7L, 100.0),
      (2L, "2024-01-01 12:00:00", 7L, 200.0),
      (3L, "2024-01-01 09:00:00", 8L, 300.0)) // user 8 has no prior right row
    val right = evs(
      (11L, "2024-01-01 09:30:00", 7L, 1.0),
      (12L, "2024-01-01 11:59:59", 7L, 2.0),
      (13L, "2024-01-01 10:00:00", 8L, 3.0)) // after left -> no match
    val got = TemporalJoins.asofBackward(
        left, right, Seq("user_id"), "ts", "ts",
        payload = Seq("value" -> "right_value"), matchTimeAs = "right_ts")
      .select("event_id", "right_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None))
  }

  test("asof treats an exactly simultaneous right row as a match") {
    val left = evs((1L, "2024-01-01 10:00:00", 7L, 0.0))
    val right = evs((11L, "2024-01-01 10:00:00", 7L, 42.0))
    val got = TemporalJoins.asofBackward(left, right, Seq("user_id"), "ts", "ts",
        payload = Seq("value" -> "v")).select("v").as[Option[Double]].collect()
    assert(got.toSeq == Seq(Some(42.0)))
  }

  test("asof tolerance nulls out matches older than the window") {
    val left = evs((1L, "2024-01-01 10:00:00", 7L, 0.0))
    val right = evs((11L, "2024-01-01 08:00:00", 7L, 42.0)) // 2h old
    val got = TemporalJoins.asofBackward(left, right, Seq("user_id"), "ts", "ts",
        payload = Seq("value" -> "v"), toleranceSec = Some(3600L))
      .select("v").as[Option[Double]].collect()
    assert(got.toSeq == Seq(None))
  }

  test("asof join plans one shuffle on the key, no nested loop") {
    val left = evs((1L, "2024-01-01 10:00:00", 7L, 0.0))
    val right = evs((11L, "2024-01-01 09:00:00", 7L, 1.0))
    val plan = TemporalJoins.asofBackward(left, right, Seq("user_id"), "ts", "ts",
      payload = Seq("value" -> "v")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Window"))
  }

  test("band pairs finds exactly the pairs within the band, incl. across buckets") {
    // band = 60s; buckets of 60s. Pair (1,2): gap 30s same bucket;
    // pair (2,3): gap 45s crossing a bucket boundary; (1,3): gap 75s -> out;
    // user 9 isolated -> no pairs.
    val ev = evs(
      (1L, "2024-01-01 10:00:15", 7L, 0.0),
      (2L, "2024-01-01 10:00:45", 7L, 0.0),
      (3L, "2024-01-01 10:01:30", 7L, 0.0),
      (4L, "2024-01-01 10:00:00", 9L, 0.0))
    val got = TemporalJoins.timeBandPairs(ev, Seq("user_id"), "ts", "event_id", 60L)
      .select("id_a", "id_b", "gap_s").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 30L), (2L, 3L, 45L)))
  }

  test("band pairs emits no duplicates from the two-bucket expansion") {
    val ev = evs(
      (1L, "2024-01-01 10:00:59", 7L, 0.0),
      (2L, "2024-01-01 10:01:01", 7L, 0.0))
    val rows = TemporalJoins.timeBandPairs(ev, Seq("user_id"), "ts", "event_id", 60L)
      .collect()
    assert(rows.length == 1)
  }
}
