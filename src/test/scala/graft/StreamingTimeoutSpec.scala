package graft

import java.nio.file.{Files, Paths}

import graft.streaming.{EventStreams, StreamEvent}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-time-timeout sessionization across real micro-batch boundaries:
  * the input is split into two files processed one per trigger
  * (maxFilesPerTrigger=1), so sessions that straddle the boundary exercise
  * cross-batch state, and the advancing watermark closes sessions via
  * GroupStateTimeout.EventTimeTimeout. */
class StreamingTimeoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sessions spanning micro-batches match batch sessionization; watermark closes state") {
    val events = Tables.load(spark, TestSpark.Sf0001, "events")
      .select("user_id", "ts", "event_id")

    // ground truth first: sessionize all events locally with the 30-min gap
    val gapMillis = 30L * 60 * 1000
    case class LocalSession(uid: Long, sid: Long, startMs: Long, endMs: Long, n: Long)
    val truth = events.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .groupBy(_._1)
      .flatMap { case (uid, evs) =>
        val sorted = evs.sortBy(e => (e._2, e._3))
        val sessions = scala.collection.mutable.ArrayBuffer.empty[LocalSession]
        for (e <- sorted) {
          if (sessions.nonEmpty && e._2 - sessions.last.endMs <= gapMillis) {
            val l = sessions.last
            sessions(sessions.length - 1) = l.copy(endMs = e._2, n = l.n + 1)
          } else sessions += LocalSession(uid, sessions.size + 1, e._2, e._2, 1L)
        }
        sessions
      }.toSet
    val truthKeys = truth.map(s => (s.uid, s.sid, s.n, s.startMs / 1000))

    // split INSIDE a multi-event session so cross-batch state is exercised
    val target = truth.filter(_.n >= 2).minBy(_.startMs)
    val splitTs = new java.sql.Timestamp((target.startMs + target.endMs) / 2)

    // stage: two parquet files split at splitTs, older file first
    val stage = Files.createTempDirectory("graft_stream_timeout").toString
    events.filter(col("ts") <= lit(splitTs)).coalesce(1)
      .write.parquet(s"$stage/batch1")
    events.filter(col("ts") > lit(splitTs)).coalesce(1)
      .write.parquet(s"$stage/batch2")
    val dir = Files.createTempDirectory("graft_stream_timeout_in")
    var tick = 1000L
    Seq("batch1", "batch2").foreach { b =>
      val src = Files.list(Paths.get(stage, b)).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(s"$b.parquet")
      Files.copy(src, dst)
      dst.toFile.setLastModified(System.currentTimeMillis() - 100000 + tick)
      tick += 1000
    }

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withWatermark("ts", "1 second")
      .as[StreamEvent]
    val sessions = EventStreams.sessionizeEventTime(stream, gapMinutes = 30)
    val q = sessions.toDF().writeStream.outputMode("append")
      .format("memory").queryName("timeout_sessions").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("timeout_sessions")
      .select(col("user_id"), col("session_id"), col("events_in_session"),
        date_trunc("second", col("session_start")).as("session_start"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3))).toSet
    assert(streamed.nonEmpty, "no sessions were closed by gap or watermark")

    // every closed streaming session must be a true session, verbatim
    val streamedKeys = streamed.map { case (u, sid, n, st) => (u, sid, n, st.getTime / 1000) }
    val missing = streamedKeys -- truthKeys
    assert(missing.isEmpty, s"streaming emitted sessions unknown to truth: ${missing.take(5)}")

    // cross-batch state carry: at least one session straddling the file
    // split must be emitted with its full (both-files) event count
    val straddling = truth.filter(s => s.startMs <= splitTs.getTime && s.endMs > splitTs.getTime)
    assert(straddling.nonEmpty, "test data produced no boundary-straddling session")
    val carried = straddling.filter(s =>
      streamedKeys.contains((s.uid, s.sid, s.n, s.startMs / 1000)))
    assert(carried.nonEmpty,
      s"no straddling session was emitted with its full cross-batch count (straddling=${straddling.size})")

    // COMPLETENESS (closed-session equality): every session the stream is
    // obliged to have closed must be present — (a) gap-closed sessions (a
    // later session of the same user exists, so the closing event arrived),
    // and (b) timeout-closed sessions whose end + gap is strictly under the
    // final watermark (max event time - 1s delay), with a 1s margin on the
    // boundary where Spark's strictly-greater timeout semantics decide.
    val wmMs = truth.map(_.endMs).max - 1000
    val lastSid = truth.groupBy(_.uid).view.mapValues(_.map(_.sid).max).toMap
    val gapClosed = truth.filter(s => s.sid < lastSid(s.uid))
    val mustClose = (gapClosed ++
      truth.filter(s => s.endMs + gapMillis < wmMs - 1000))
      .map(s => (s.uid, s.sid, s.n, s.startMs / 1000)).toSet
    val mayClose = (gapClosed ++
      truth.filter(s => s.endMs + gapMillis <= wmMs + 1000))
      .map(s => (s.uid, s.sid, s.n, s.startMs / 1000)).toSet
    val notClosed = mustClose -- streamedKeys
    assert(notClosed.isEmpty,
      s"sessions the watermark obliges closed were not emitted: ${notClosed.take(5)} " +
        s"(${notClosed.size} of ${mustClose.size})")
    val overClosed = streamedKeys -- mayClose
    assert(overClosed.isEmpty,
      s"sessions emitted that the watermark cannot have closed: ${overClosed.take(5)}")
  }

  test("a late in-watermark event extends the session backward, never splits it") {
    def ev(id: Long, ts: String) =
      (1L, java.sql.Timestamp.valueOf(ts), id)
    // batch 1: 10:00, 10:10; batch 2: LATE 09:55 (within the 1h watermark)
    // then 13:00, whose gap closes the session. The closed session must
    // span 09:55-10:10 with 3 events — a regressed lastMicros would have
    // mis-timed the close, an unmoved start would report 10:00.
    val b1 = Seq(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:10:00"))
    val b2 = Seq(ev(3, "2024-01-01 09:55:00"), ev(4, "2024-01-01 13:00:00"))
    val dir = Files.createTempDirectory("graft_late_in")
    var tick = 1000L
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      val stage = Files.createTempDirectory(s"graft_late_stage$i").resolve("out").toString
      b.toDF("user_id", "ts", "event_id").coalesce(1).write.parquet(stage)
      val src = Files.list(Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = dir.resolve(s"b$i.parquet")
      Files.copy(src, dst)
      dst.toFile.setLastModified(System.currentTimeMillis() - 100000 + tick)
      tick += 1000
    }
    val schema = b1.toDF("user_id", "ts", "event_id").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .withWatermark("ts", "1 hour").as[StreamEvent]
    val q = EventStreams.sessionizeEventTime(stream, gapMinutes = 30)
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("late_sessions").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("late_sessions")
      .select("user_id", "session_id", "events_in_session", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3).toString)).toSeq
    assert(got == Seq((1L, 1L, 3L, "2024-01-01 09:55:00.0")), s"got $got")
  }
}
