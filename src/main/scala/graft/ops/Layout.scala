package graft.ops

import java.io.File

import graft.Tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-order (Morton) clustering for
  * multi-dimensional data skipping — the lakehouse OPTIMIZE ZORDER
  * pattern, re-built on plain Spark + parquet.
  *
  * Why it matters at 100 TB: parquet readers prune row groups (and
  * engines prune whole files) from footer min/max statistics, but a
  * linear sort clusters only its LEADING column — a predicate on any
  * other column intersects every file. Interleaving the bits of k
  * normalized column ranks makes every file a ~hypercube in value space,
  * so point/box predicates on ANY of the k columns prune most files. The
  * write is one extra range-repartition + within-partition sort — no
  * shuffle beyond what a clustered write needs anyway; reads need no new
  * machinery (parquet predicate pushdown does the pruning).
  *
  * Skipping is an OPTIMIZATION, never a semantics change: the rewritten
  * copy holds exactly the base rows, which the `zorder_scan` oracle entry
  * pins; `LayoutSpec` pins the pruning itself from the written files'
  * footer ranges, z-order vs linear sort. */
object Layout {

  /** Morton key: interleave `bits` bits of each column's normalized cell
    * rank. Columns are min/max-normalized to [0, 2^bits) — ranks, not raw
    * values, so skew in one column cannot starve the others' bits. */
  def zOrderKey(cells: Seq[Column], bits: Int = 16): Column = {
    val nc = cells.size
    require(nc >= 1 && nc * bits <= 60, s"$nc cols x $bits bits exceeds long")
    val terms = for {
      b <- 0 until bits
      (cell, j) <- cells.zipWithIndex
    } yield shiftleft(shiftright(cell.cast("long"), b).bitwiseAND(lit(1L)),
      b * nc + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Normalize a numeric column into an integer cell in [0, 2^bits) given
    * its global min/max (computed once per write, driver-side). */
  private def cellOf(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
    least(lit((1 << bits) - 1), greatest(lit(0),
      floor((c.cast("double") - lit(mn)) / lit(span) * lit((1 << bits).toDouble))
        .cast("long")))
  }

  /** Write `df` as `numFiles` Z-order-clustered parquet files under
    * `path`. One stats pass (min/max of the z columns), then
    * repartitionByRange + sortWithinPartitions on the Morton key — each
    * output file covers a compact hypercube of the z-column space. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      numFiles: Int = 8, bits: Int = 16): Unit =
    zOrderedWrite(df, path, zCols, numFiles, bits, "overwrite")

  /** Append new rows to a z-ordered table WITHOUT re-clustering history —
    * the write half of the lakehouse maintenance cadence (cheap clustered
    * appends, periodic [[compact]]/[[writeZOrdered]] re-cluster). The
    * appended batch is z-ordered among ITSELF into its own files: each
    * new file is still a value-space hypercube of the new rows, so
    * footer min/max pruning keeps working file-locally; only the global
    * clustering (fewer, tighter hypercubes) degrades as the appended
    * fraction grows. Cost is O(|batch|), never O(|table|) — the property
    * that makes nightly appends to a 100 TB clustered table affordable. */
  def appendZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      numFiles: Int = 2, bits: Int = 16): Unit =
    zOrderedWrite(df, path, zCols, numFiles, bits, "append")

  private def zOrderedWrite(df: DataFrame, path: String, zCols: Seq[String],
      numFiles: Int, bits: Int, mode: String): Unit = {
    require(zCols.nonEmpty)
    val stats = df.agg(
      zCols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
        .head,
      zCols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
        .tail: _*).head()
    zCols.zipWithIndex.foreach { case (c, i) =>
      require(!stats.isNullAt(2 * i),
        s"z-order column $c has no non-null values — cannot cluster on it") }
    val cells = zCols.zipWithIndex.map { case (c, i) =>
      cellOf(col(c), stats.getDouble(2 * i), stats.getDouble(2 * i + 1), bits) }
    df.withColumn("__z", zOrderKey(cells, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(path)
  }

  /** Idempotent z-ordered copy of a base table, fingerprinted by the base
    * files + layout definition (same contract as the materialized-view
    * store: changed base data -> fresh path). The file part reuses the MV
    * store's per-file (path, length, mtime) walk — the previous
    * directory-level length/mtime probe missed in-place file rewrites
    * that leave the directory entry untouched (ADVICE r6). */
  def ensureZOrdered(spark: SparkSession, dir: String, table: String,
      zCols: Seq[String], numFiles: Int = 8): String = synchronized {
    val src = new File(s"$dir/$table.parquet")
    val fp = graft.plans.MaterializedViews.stringFingerprint(
      dir + table + zCols.mkString(",") + numFiles) + "-" +
      graft.plans.MaterializedViews.filesFingerprint(Seq(src.getPath))
    val path = new File(new File(
      sys.props("java.io.tmpdir"), "graft-zorder"), s"$table-$fp").getPath
    if (!new File(path, "_SUCCESS").exists())
      writeZOrdered(Tables.load(spark, dir, table), path, zCols, numFiles)
    path
  }

  /** Per-file (min, max) of a column across the written files — the same
    * footer statistics a reader prunes with, surfaced for tests and
    * diagnostics. */
  def fileRanges(spark: SparkSession, path: String, c: String)
      : Seq[(String, Double, Double)] =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(c)).cast("double").as("mn"), max(col(c)).cast("double").as("mx"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSeq

  /** Small-file compaction (the OPTIMIZE-compact half of lakehouse table
    * maintenance; [[writeZOrdered]] is the clustering half): rewrite a
    * parquet directory into ceil(bytes/target) files. Small files are a
    * 100 TB operational killer — each costs a task, a footer read, and an
    * open per scan, so a million 1 MB files turns every query into task-
    * scheduling overhead. Uses coalesce (no shuffle) when shrinking the
    * file count, repartition otherwise. Writes to `dst` — compaction into
    * place would delete the inputs of a concurrently running scan. */
  def compact(spark: SparkSession, src: String, dst: String,
      targetBytes: Long = 128L << 20): Long = {
    require(src != dst, "compact writes to a NEW directory")
    val bytes = new File(src).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.length).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(src)
    val current = df.rdd.getNumPartitions
    val sized = if (n <= current) df.coalesce(n) else df.repartition(n)
    sized.write.mode("overwrite").parquet(dst)
    n.toLong
  }

  /** Bucketed + per-bucket-sorted copy of a base table, registered in the
    * session catalog — the CO-LOCATED JOIN lever. Two tables bucketed on
    * their join keys into the same bucket count sort-merge-join with ZERO
    * shuffle exchanges: the scan itself reports the hash partitioning the
    * join needs. At 100 TB a fact-fact join shuffles BOTH sides — the
    * single largest movable cost in such a plan — and bucketing moves
    * that shuffle to WRITE time, paid once and amortized over every
    * subsequent join/aggregate on the key.
    *
    * Fingerprinted like the z-ordered copy (per-file walk + definition):
    * a changed base produces a fresh bucket table. The data lives at an
    * explicit external LOCATION, so a NEW session (fresh in-memory
    * catalog) re-registers the existing files with external-table DDL
    * carrying the same CLUSTERED BY spec — no rewrite. Returns the
    * catalog table name. */
  def ensureBucketed(spark: SparkSession, dir: String, table: String,
      keys: Seq[String], buckets: Int = 8): String = synchronized {
    val src = new File(s"$dir/$table.parquet")
    val fp = graft.plans.MaterializedViews.stringFingerprint(
      dir + table + keys.mkString(",") + buckets) + "_" +
      graft.plans.MaterializedViews.filesFingerprint(Seq(src.getPath))
    val tbl = s"graft_bkt_${table}_$fp"
    if (!spark.catalog.tableExists(tbl)) {
      val loc = new File(new File(
        sys.props("java.io.tmpdir"), "graft-bkt"), tbl)
      val keyList = keys.mkString(", ")
      if (new File(loc, "_SUCCESS").exists()) {
        // files already bucketed by an earlier session: register, don't
        // rewrite (the bucket spec must match the written layout — the
        // fingerprinted name guarantees it)
        val schemaDdl = Tables.load(spark, dir, table).schema.toDDL
        spark.sql(
          s"""CREATE TABLE $tbl ($schemaDdl) USING parquet
             |CLUSTERED BY ($keyList) SORTED BY ($keyList)
             |INTO $buckets BUCKETS
             |LOCATION '${loc.getAbsolutePath}'""".stripMargin)
      } else {
        // pre-partition on the bucket keys so each task holds few
        // buckets — fewer files per bucket, more of the merge-sort
        // pre-done at write time
        Tables.load(spark, dir, table)
          .repartition(buckets, keys.map(col): _*)
          .write
          .bucketBy(buckets, keys.head, keys.tail: _*)
          .sortBy(keys.head, keys.tail: _*)
          .option("path", loc.getAbsolutePath)
          .mode("overwrite")
          .saveAsTable(tbl)
      }
    }
    tbl
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // box query over the z-ordered copy: identical rows to the base table
    // (layout is pure reorganization), pruned scan at execution
    "zorder_scan" -> ((s, d) => {
      val path = ensureZOrdered(s, d, "lineitem",
        Seq("l_orderkey", "l_partkey"))
      s.read.parquet(path)
        .filter(col("l_orderkey").between(1000, 3000) &&
          col("l_partkey").between(100, 1000))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
        .orderBy("l_returnflag")
    }),
    // fact-fact join over co-bucketed copies: the join runs with zero
    // shuffle exchanges (LayoutSpec pins the plan; the only exchange in
    // the query is the aggregate's). Broadcast is disabled in the entry's
    // own session because this is the 100 TB shape — neither side of a
    // fact-fact join fits a broadcast there, and the entry must measure
    // the plan that scale actually gets.
    "bucketed_join" -> ((spark0, d) => {
      val spark = spark0.newSession()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val lt = ensureBucketed(spark, d, "lineitem", Seq("l_orderkey"))
      val ot = ensureBucketed(spark, d, "orders", Seq("o_orderkey"))
      spark.table(lt)
        .join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("sum_qty"),
          // prices carry 2 decimals (see s34): rounding erases the
          // partial-sum-order float noise between Spark and the oracle
          round(sum("l_extendedprice"), 2).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }))

  val oracle: Seq[(String, String)] = Seq(
    "zorder_scan" ->
      """SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 3000
        |  AND l_partkey BETWEEN 100 AND 1000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "bucketed_join" ->
      """SELECT o_orderpriority, SUM(l_quantity) AS sum_qty,
        |       ROUND(SUM(l_extendedprice), 2) AS sum_price, COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
