package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Catalog bootstrap — the Spark-native analog of the reference's catalog
  * discovery (`PostgresConnection::load_catalog`,
  * reference `src/sqldb/postgres/mod.rs:67-125`): where the reference reads
  * `information_schema` to derive Arrow schemas, we read self-describing
  * parquet footers and register each table in the Spark `SessionCatalog`.
  *
  * Scale note: these are plain parquet scans — Spark's vectorized reader
  * gives columnar batches, predicate pushdown, and column pruning for free,
  * which is the 100 TB-safe replacement for the reference's hand-rolled
  * binary COPY decoder (`src/sqldb/postgres/binary_reader.rs:24-209`).
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from `dir`; `events` goes through [[loadEvents]]. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize whatever physical encoding `events.ts` arrives in to a
    * session-TZ `timestamp` column. The reference never assumes a physical
    * type — it derives schemas from source metadata per run
    * (`src/sqldb/postgres/datatypes.rs:98-125`); the Spark-native analog is
    * branching on the dtype the parquet footer actually yields:
    *
    *  - `LongType`: legacy INT64 TIMESTAMP(NANOS) read under
    *    `nanosAsLong` — exact integer `div 1000` to micros (never double
    *    math, so no sub-microsecond rounding can leak into comparisons);
    *  - `TimestampNTZType`: parquet `timestamp[us/ms]` with
    *    isAdjustedToUTC=false — wall-clock values; the engine runs UTC
    *    sessions ([[Engine.create]]), so the cast is value-identity;
    *  - `TimestampType`: already an instant — pass through.
    *
    * Anything else fails loudly, as does a timestamp range outside the
    * generator's era ([[assertEventsEra]]) — the guard that turns a silent
    * unit-mismatch (the round-9 1000x time compression) into one named
    * error at ingest. */
  private[graft] def tsToTimestamp(dt: DataType): Column = dt match {
    case LongType => expr("timestamp_micros(ts div 1000)")
    case _: TimestampNTZType => col("ts").cast(TimestampType)
    case TimestampType => col("ts")
    case other => throw new IllegalStateException(
      s"events.ts: unsupported physical type $other (expected INT64 nanos, timestamp_ntz, or timestamp)")
  }

  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    // tolerate legacy TIMESTAMP(NANOS) files (read as long, branch above);
    // a no-op for native timestamp[us]/[ms] encodings
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val df = raw
      .withColumn("ts", tsToTimestamp(raw.schema("ts").dataType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    assertEventsEra(df, s"$dir/events.parquet")
    df
  }

  /** Era sanity: every events timestamp must land in [2000, 2100). A unit
    * mismatch is never subtle — micros read as nanos lands in 1970, nanos
    * read as micros in year ~3700 — so this one bounded check (min/max of a
    * single pruned column) converts the data-corruption failure class into
    * a loud ingest error. Memoized per file identity (path+size+mtime): the
    * corpus loads events once per query, and re-scanning ts inside a timed
    * bench region would tax every entry for a check that can't change. */
  private val eraOk = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val EraMinMillis = java.time.Instant.parse("2000-01-01T00:00:00Z").toEpochMilli
  private val EraMaxMillis = java.time.Instant.parse("2100-01-01T00:00:00Z").toEpochMilli

  private def assertEventsEra(events: DataFrame, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    val key = s"$path:${java.nio.file.Files.size(p)}:${java.nio.file.Files.getLastModifiedTime(p)}"
    if (!eraOk.contains(key)) {
      events.agg(min("ts"), max("ts")).head() match {
        case row if row.isNullAt(0) => // empty table: nothing to validate
        case row =>
          val (mn, mx) = (row.getTimestamp(0).getTime, row.getTimestamp(1).getTime)
          if (mn < EraMinMillis || mx >= EraMaxMillis)
            throw new IllegalStateException(
              s"events.ts out of era [2000,2100): min=${row.get(0)} max=${row.get(1)} in $path — " +
                "suspected timestamp unit mismatch at ingest")
      }
      eraOk.add(key)
    }
  }

  /** Register every table as a temp view named exactly like the oracle's
    * DuckDB views, so shared SQL text resolves identically in both engines.
    * Memoized per (session, dir): SQL-text corpus queries call this on
    * every invocation, and re-reading 10 parquet footers inside a timed
    * bench region would tax those queries for setup the DataFrame-API
    * queries don't pay. Switching dirs re-registers. */
  private val registeredDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  def registerAll(spark: SparkSession, dir: String): Unit =
    if (registeredDir.get(spark) != dir) {
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      registeredDir.put(spark, dir)
    }
}
