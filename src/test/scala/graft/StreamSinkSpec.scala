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

  test("postings stream survives a crash between epoch commit and checkpoint commit") {
    import org.apache.spark.sql.{DataFrame, Row}
    // three single-file micro-batches of documents
    val in = Files.createTempDirectory("graft_postcp_in").toString
    val spark0 = spark; import spark0.implicits._
    def drop(name: String, rows: (Long, String)*): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/$name")
    drop("f0", 1L -> "a b", 2L -> "a a c")
    drop("f1", 3L -> "a d")
    drop("f2", 4L -> "b a")
    val schema = spark.read.parquet(s"$in/f0").schema
    val idx = Files.createTempDirectory("graft_postcp_idx").toString
    val cp = Files.createTempDirectory("graft_postcp_cp").toString
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*")
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], bid: Long) =>
          graft.ops.Search.appendPostingsBatch(b.toDF(), idx, bid); ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(graft.ops.Dedup.committedEpochs(idx).size === 3)
    val before = graft.ops.Search.queryPostingsIndex(spark, idx, Seq("a"))
      .as[(Long, Long, Long, Long)].collect()
    // simulate the crash window: the epoch marker landed but the
    // checkpoint's commit log for the LAST batch did not — on restart
    // Spark REPLAYS that micro-batch (the at-least-once contract), and
    // the deterministic tag gate must swallow the redelivery
    val commitDir = new java.io.File(cp, "commits")
    val commits = commitDir.listFiles()
      .filterNot(_.getName.startsWith("."))
      .sortBy(_.getName.toLong) // batch ids are integers: numeric order
    assert(commits.nonEmpty)
    val last = commits.last
    // the local checkpoint manager keeps a checksum sidecar per marker;
    // it must go too or the replay's rename trips over the stale CRC
    new java.io.File(commitDir, s".${last.getName}.crc").delete()
    assert(last.delete(), "could not remove the last commit marker")
    run()
    assert(graft.ops.Dedup.committedEpochs(idx).size === 3,
      "the replayed micro-batch must not land a second epoch")
    val after = graft.ops.Search.queryPostingsIndex(spark, idx, Seq("a"))
      .as[(Long, Long, Long, Long)].collect()
    assert(after === before, "tf must not double under redelivery")
  }
}
