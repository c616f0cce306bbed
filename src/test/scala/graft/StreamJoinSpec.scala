package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join must produce exactly the batch join's rows —
  * the bounded replay emits every pair once (watermark only bounds state,
  * it must not drop anything when the source is replayed in order). */
class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("watermarked purchase-click interval join equals the batch equivalent") {
    val streamed = EventStreams.purchaseClickJoin(spark, TestSpark.Sf0001)
      .select("purchase_id", "click_id", "gap_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
      .withColumn("ts2", date_trunc("second", col("ts")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts2").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts2").as("c_ts"))
    val batch = p.join(c, expr(
        "user_id = c_user AND c_ts >= p_ts - interval 30 minutes AND c_ts < p_ts"))
      .select(col("purchase_id"), col("click_id"),
        ((unix_micros(col("p_ts")) - unix_micros(col("c_ts"))) / 1000000L)
          .cast("long").as("gap_s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(batch.nonEmpty) // sf0.001 has known pairs; empty = vacuous test
    assert(streamed == batch)
  }
}
