package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming file sink (A10 streaming side): windowed aggregates written to
  * parquet with a checkpoint, in append mode — only watermark-closed
  * windows land in the sink, which is the exactly-once production path. */
class StreamSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("windowed aggregate streams to a parquet sink exactly once") {
    // stage the events file into a streamable dir (hard link, no copy)
    val in = Files.createTempDirectory("graft_sink_in")
    try Files.createLink(in.resolve("events.parquet"),
      java.nio.file.Paths.get(TestSpark.Sf0001, "events.parquet"))
    catch { case _: Exception =>
      Files.copy(java.nio.file.Paths.get(TestSpark.Sf0001, "events.parquet"),
        in.resolve("events.parquet"))
    }
    val out = Files.createTempDirectory("graft_sink_out").toString
    val cp = Files.createTempDirectory("graft_sink_cp").toString

    // schema from the staged file's own footer, ts normalized exactly like
    // the engine's loader — encoding-agnostic, same as EventStreams.
    // loadEvents first: it sets the legacy nanosAsLong conf, without which
    // the bare footer read below would throw on an INT64-nanos regen
    Tables.loadEvents(spark, TestSpark.Sf0001)
    val rawSchema = spark.read.parquet(in.toString).schema
    val agg = spark.readStream.schema(rawSchema).parquet(in.toString)
      .withColumn("ts", Tables.tsToTimestamp(rawSchema("ts").dataType))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    try q.processAllAvailable() finally q.stop()

    val sunk = spark.read.parquet(out)
      .select(col("window.start").as("day"), col("event_type"), col("n"))
    val batch = Tables.load(spark, TestSpark.Sf0001, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // append emits only watermark-closed windows: everything in the sink
    // must match batch exactly, and most days must have arrived
    val sunkSet = sunk.collect().map(_.toString).toSet
    val batchSet = batch.collect().map(_.toString).toSet
    assert(sunkSet.nonEmpty)
    assert(sunkSet.subsetOf(batchSet),
      s"sink rows not in batch: ${(sunkSet -- batchSet).take(3)}")
    assert(sunkSet.size >= batchSet.size - 8,
      s"too few closed windows: ${sunkSet.size} of ${batchSet.size}")
  }
}
