package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Read one table from `dir`. `events.ts` is stored as parquet
    * INT64 TIMESTAMP(NANOS), which Spark's reader rejects by default
    * (PARQUET_TYPE_ILLEGAL); we read nanos as long and convert with exact
    * integer division (`div`), never double math, so no sub-microsecond
    * rounding can leak into comparisons. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else spark.read.parquet(s"$dir/$name.parquet")
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
