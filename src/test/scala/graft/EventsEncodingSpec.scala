package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 regression guard: the driver regenerated the testdata with a
  * different parquet physical type for `events.ts` (INT64 TIMESTAMP(NANOS)
  * → native timestamp[us]) and the then-hard-coded conversion corrupted
  * every streaming window 1000×. This spec pins the fix: [[Tables.loadEvents]]
  * must yield the identical result for every plausible physical encoding,
  * and a unit-mismatched file must fail loudly at ingest, never silently.
  * (The reference derives schemas from source metadata per run —
  * `src/sqldb/postgres/datatypes.rs:98-125` — rather than assuming one.) */
class EventsEncodingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Canonical tiny events table; millis-aligned timestamps so every
    * encoding (nanos / micros / millis) round-trips exactly. */
  private def canonical(): DataFrame = {
    import spark.implicits._
    val base = 1717243200123L // 2024-06-01 12:00:00.123 UTC, millis
    (1L to 20L).map { i =>
      (i, base + i * 137000L, i % 5, if (i % 3 == 0) "click" else "purchase",
        i * 1.5, s"""{"k":$i}""")
    }.toDF("event_id", "ms", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def writeAs(df: DataFrame, encode: DataFrame => DataFrame,
      outputType: Option[String] = None): String = {
    val dir = Files.createTempDirectory("graft_enc").toString
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    outputType.foreach(t => spark.conf.set("spark.sql.parquet.outputTimestampType", t))
    try encode(df).write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    dir
  }

  test("loadEvents yields identical rows for every physical ts encoding") {
    val df = canonical()
    val dirs = Map(
      // legacy path: INT64 nanos read as long (what nanosAsLong yields for
      // TIMESTAMP(NANOS) files, which Spark itself cannot write)
      "int64-nanos" -> writeAs(df, d => d.withColumn("ts",
        (unix_micros(col("ts")) * 1000L).as("ts"))),
      // the regenerated-testdata shape: timestamp[us], isAdjustedToUTC=false
      "ntz-micros" -> writeAs(df, d => d.withColumn("ts",
        col("ts").cast("timestamp_ntz"))),
      // instant micros (isAdjustedToUTC=true)
      "tz-micros" -> writeAs(df, identity, Some("TIMESTAMP_MICROS")),
      // instant millis
      "tz-millis" -> writeAs(df, identity, Some("TIMESTAMP_MILLIS")))

    val results = dirs.map { case (name, dir) =>
      val out = Tables.loadEvents(spark, dir)
      assert(out.schema("ts").dataType == TimestampType,
        s"$name: ts must normalize to TimestampType, got ${out.schema("ts").dataType}")
      name -> out.orderBy("event_id").collect().map(_.toString).toSeq
    }
    val expected = df.orderBy("event_id").collect().map(_.toString).toSeq
    results.foreach { case (name, rows) =>
      assert(rows == expected, s"$name: loadEvents output diverges from canonical")
    }
  }

  test("unit-mismatched timestamps fail loudly at ingest, not silently") {
    // micros misread as nanos → every instant lands in 1970; the era guard
    // must throw instead of letting windows/sessions silently collapse
    val bad = canonical().withColumn("ts",
      timestamp_micros((unix_micros(col("ts")) / 1000L).cast("long")))
    val dir = writeAs(bad, identity, Some("TIMESTAMP_MICROS"))
    val e = intercept[IllegalStateException](Tables.loadEvents(spark, dir))
    assert(e.getMessage.contains("out of era"))
  }

  test("an unsupported physical ts type is rejected by name") {
    val e = intercept[IllegalStateException](
      Tables.tsToTimestamp(org.apache.spark.sql.types.StringType))
    assert(e.getMessage.contains("unsupported physical type"))
  }
}
