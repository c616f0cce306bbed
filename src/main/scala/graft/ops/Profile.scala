package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE-style statistics pass every pipeline
  * runs before trusting a new dataset: per-column row/null/distinct
  * counts and value bounds, in long format (one row per column). The
  * reference's catalog surfaces only type metadata from
  * `information_schema` (`src/sqldb/postgres/mod.rs:99-104`); this adds
  * the data-derived statistics tier the optimizer and the data engineer
  * both read (the same numbers `GraftCatalog`'s broadcast-sizing
  * consumes as table-level row counts).
  *
  * Scale shape: ONE scan, two bounded aggregates. Each row explodes
  * map-side into one (column-id, typed value slot) record per profiled
  * column — values stay in a slot of their OWN type (one slot per
  * distinct column type), so min/max order natively, never
  * lexicographically. The first aggregate hash-counts (column, value)
  * combos (count-only buffer → HashAggregate, partial+final; the shuffle
  * carries distinct values per column, not rows); the second reduces
  * those ~Σ|distinct| combos to one row per column: n_distinct is a row
  * count, n_not_null a sum of combo counts — exact COUNT(DISTINCT)
  * without ever mixing distinct and plain aggregates in one Expand (that
  * mixed plan degenerates to a SortAggregate over the expanded rows —
  * measured 5× slower at sf0.1). At 100 TB the drop-in knob is
  * `approx_count_distinct` (HLL, no expansion at all); the exact form is
  * kept here because the oracle must agree to the digit. Bounds render
  * `CAST(… AS STRING)` AFTER aggregation so heterogeneous columns share
  * one output schema.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val types = cols.map(c => df.schema(c).dataType)
    val slotTypes = types.distinct
    val slotNames = slotTypes.indices.map(j => s"v$j")
    // one struct per profiled column: its value in its type's slot, the
    // other slots null — array+explode is the map-side Expand
    val records = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("gid") +: slotTypes.zipWithIndex.map { case (t, j) =>
        (if (types(i) == t) col(c) else lit(null).cast(t)).as(s"v$j")
      }: _*)
    }
    val combos = df
      .select(explode(array(records: _*)).as("e"))
      .select(col("e.gid").as("gid") +: slotNames.map(n => col(s"e.$n").as(n)): _*)
      .groupBy(col("gid") +: slotNames.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val isNullRec = slotNames.map(col(_).isNull).reduce(_ && _)
    val perCol = combos
      .groupBy("gid")
      .agg(
        sum("cnt").as("n_rows"),
        sum(when(isNullRec, 0L).otherwise(col("cnt"))).as("n_not_null"),
        count(when(!isNullRec, 1)).as("n_distinct"),
        coalesce(slotTypes.indices.map(j =>
          min(col(s"v$j")).cast("string")): _*).as("min_value"),
        coalesce(slotTypes.indices.map(j =>
          max(col(s"v$j")).cast("string")): _*).as("max_value"))
    val nameOf = element_at(
      array(cols.map(lit): _*), col("gid") + 1)
    perCol.select(
      nameOf.as("column_name"), col("n_rows"), col("n_not_null"),
      (col("n_rows") - col("n_not_null")).as("n_null"),
      col("n_distinct"), col("min_value"), col("max_value"))
      .orderBy("column_name")
  }

  private val LineitemCols =
    Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")

  /** Discrete percentile statistics — the ANALYZE tier's other half,
    * in long format: one row per (column, per-mille point). Semantics are
    * the DISCRETE quantile, pinned in integer arithmetic: the smallest
    * value whose cumulative count clears the rank threshold, compared
    * CROSS-MULTIPLIED (`cum·1000 ≥ p‰·total` in longs ⟺ cum ≥
    * ceil(p‰·total/1000) for integer cum) — no float rank, no
    * interpolation, no knife edges; the value returned is always a real
    * data value. Interpolated percentiles were rejected deliberately:
    * Spark's `percentile` and DuckDB's `quantile_cont` interpolate with
    * differently-ordered float expressions, the exact last-ulp
    * disagreement class the oracle differ exists to catch.
    *
    * Scale shape mirrors [[profile]]: ONE scan explodes map-side into
    * (column, double value) records, a partial+final count collapses to
    * distinct (column, value) combos, and the cumulative count runs over
    * those combos with the TWO-PHASE grouped prefix sum (range-sort by
    * (column, value), one subtotal per (partition, column) to the driver,
    * stream pass 2 with broadcast offsets) — NOT a `SUM OVER (PARTITION
    * BY column ORDER BY value)` window, which funnels every combo of a
    * high-cardinality column through one task (the window cut measured
    * 5.0 s at sf0.1 — 600k-distinct `l_extendedprice` — vs 3.0 s for
    * this shape on the same host; the remaining floor is the combo
    * aggregate itself).
    * Per-column totals fall out of the same subtotals, so no second
    * window either. Truly unbounded domains at 100 TB can still swap in
    * `approx_percentile` (t-digest, mergeable) — same output shape,
    * documented accuracy trade. Integral casts to DOUBLE are exact below
    * 2^53. */
  def quantiles(df: DataFrame, cols: Seq[String],
      pMille: Seq[Int] = Seq(500, 900, 990)): DataFrame = {
    require(cols.nonEmpty, "quantiles needs at least one column")
    require(pMille.nonEmpty && pMille.forall(p => p >= 1 && p <= 1000),
      "per-mille points must be in [1, 1000]")
    val spark = df.sparkSession
    val recs = array(cols.map(c =>
      struct(lit(c).as("column_name"), col(c).cast("double").as("value"))): _*)
    val counts = df
      .select(explode(recs).as("r"))
      .select(col("r.column_name").as("column_name"), col("r.value").as("value"))
      .filter(col("value").isNotNull)
      .groupBy("column_name", "value")
      .agg(count(lit(1)).as("cnt"))
    // canonical order for the prefix sum; materialized because both passes
    // stream the same partitions (and pass 2 must see pass 1's order).
    // localCheckpoint, NOT persist: the eager checkpoint pins partition
    // order exactly like a cache would, but its blocks free via the
    // ContextCleaner once the returned frame is dropped — persist() would
    // pin one cache per profiling call until a global clearCache()
    // (round-11 advisory; same remedy as Dedup.probeMinhashIndex)
    val sorted = counts
      .repartitionByRange(col("column_name"), col("value"))
      .sortWithinPartitions("column_name", "value")
      .localCheckpoint()
    val schema = sorted.schema
    val colAt = schema.fieldIndex("column_name")
    val cntAt = schema.fieldIndex("cnt")
    // pass 1: one subtotal per (partition, column) — |partitions|·|cols|
    // longs to the driver, a bounded materialization
    val subs = sorted.queryExecution.toRdd.mapPartitionsWithIndex { (i, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { r =>
        val c = r.getUTF8String(colAt).toString
        m.update(c, m.getOrElse(c, 0L) + r.getLong(cntAt))
      }
      m.iterator.map { case (c, s) => (i, c, s) }
    }.collect()
    val totals: Map[String, Long] =
      subs.groupBy(_._2).map { case (c, xs) => c -> xs.map(_._3).sum }
    val prefix: Map[(Int, String), Long] = subs.groupBy(_._2).flatMap {
      case (c, xs) =>
        val inOrder = xs.sortBy(_._1)
        inOrder.zip(inOrder.scanLeft(0L)(_ + _._3))
          .map { case ((i, _, _), off) => (i, c) -> off }
    }
    val prefixB = spark.sparkContext.broadcast(prefix)
    val totalsB = spark.sparkContext.broadcast(totals)
    // pass 2: stream each partition once, carrying the running count from
    // the broadcast offset; emits (…, cum, total)
    val withCum = sorted.queryExecution.toRdd.mapPartitionsWithIndex { (i, it) =>
      var cur: String = null
      var cum = 0L
      it.map { r =>
        val c = r.getUTF8String(colAt).toString
        if (c != cur) { cur = c; cum = prefixB.value.getOrElse((i, c), 0L) }
        cum += r.getLong(cntAt)
        new org.apache.spark.sql.catalyst.expressions.JoinedRow(
          r.copy(),
          org.apache.spark.sql.catalyst.InternalRow(cum, totalsB.value(c)))
          : org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val outSchema = org.apache.spark.sql.types.StructType(schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("cum",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("total",
        org.apache.spark.sql.types.LongType, nullable = false)))
    org.apache.spark.sql.GraftSqlBridge
      .internalCreateDataFrame(spark, withCum, outSchema)
      .select(col("column_name"), col("value"), col("cum"), col("total"),
        explode(typedlit(pMille.map(_.toLong))).as("p_mille"))
      .filter(col("cum") * 1000L >= col("p_mille") * col("total"))
      .groupBy("column_name", "p_mille")
      .agg(min("value").as("value"))
      .orderBy("column_name", "p_mille")
  }

  /** Distribution drift between two snapshots of the same logical corpus
    * — the monitoring step every continuous-ingestion pipeline runs on a
    * new crawl drop BEFORE accepting it (a drop whose language/source mix
    * shifted hard usually means a broken crawler, not a changed world).
    * Per stratum: both sides' counts and per-mille shares, and the
    * absolute share delta — all integer arithmetic (share = n·1000 div
    * total, truncating in both engines), so the drift report reproduces
    * bit-exactly anywhere. Full outer join on the stratum: a class
    * appearing or vanishing IS the signal (counts coalesce to 0).
    * Scale: two partial+final count aggregates to |strata| rows, the
    * 1-row totals broadcast back — two linear scans, no corpus join. */
  def snapshotDrift(before: DataFrame, after: DataFrame,
      strataCol: String): DataFrame = {
    def shares(df: DataFrame, n: String, share: String): DataFrame = {
      val counts = df.groupBy(col(strataCol).as("stratum"))
        .agg(count(lit(1)).as(n))
      val total = counts.agg(sum(col(n)).cast("long").as("t"))
      counts.join(broadcast(total))
        .withColumn(share, expr(s"CAST($n * 1000 DIV t AS BIGINT)"))
        .drop("t")
    }
    shares(before, "n_before", "share_before_pm")
      .join(shares(after, "n_after", "share_after_pm"), Seq("stratum"), "full_outer")
      .select(
        col("stratum"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("share_before_pm"), lit(0L)).as("share_before_pm"),
        coalesce(col("share_after_pm"), lit(0L)).as("share_after_pm"))
      .withColumn("delta_pm",
        abs(col("share_after_pm") - col("share_before_pm")))
      .orderBy("stratum")
  }

  /** Epoch-to-epoch corpus membership diff — the audit every snapshot
    * handoff needs: which documents ENTERED, LEFT, or CHANGED CONTENT
    * between two corpus versions. Identity = doc_id, content = sha256 of
    * the text (the [[Dedup.exact]] hash family: 256-bit, so a silent
    * corpus-scale collision is ~n²/2^257). Unchanged documents are NOT
    * emitted — at 100 TB the diff is the small artifact, the corpus is
    * not; counts of unchanged fall out as |A| − removed − changed.
    *
    * Scale shape: each side reduces to (doc_id, 32-byte hash) map-side
    * (text never shuffles), one full-outer hash join on doc_id, one
    * status projection — two linear scans plus an id+hash exchange. */
  def corpusDiff(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("doc_id"), sha2(col("text"), 256).as("ha"))
      .join(b.select(col("doc_id"), sha2(col("text"), 256).as("hb")),
        Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("hb").isNull, "removed")
          .when(col("ha").isNull, "added")
          .when(col("ha") =!= col("hb"), "changed"))
      .filter(col("status").isNotNull)
      .select("doc_id", "status")
      .orderBy("doc_id")

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "table_profile" -> ((s, d) =>
      profile(Tables.load(s, d, "lineitem"), LineitemCols)),
    // diff fixture: epoch B drops every 11th doc, revises every 7th
    // survivor, and adds a new page per 13th doc — all three status
    // classes exercised; the oracle derives them from the planting rule,
    // so the engine's hash path must agree with pure arithmetic
    "corpus_diff" -> ((s, d) => {
      val a = Tables.load(s, d, "documents")
      val b = a.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")).as("text"))
        .unionAll(a.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(lit("new page "), col("doc_id")).as("text")))
      corpusDiff(a, b)
    }),
    "profile_quantiles" -> ((s, d) =>
      quantiles(Tables.load(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))),
    // drift fixture: the "new drop" loses every fifth English document —
    // the broken-crawler shape the monitor must surface as an en-share
    // dip mirrored by rises elsewhere
    "profile_drift" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      val drop = docs.filter(!(col("lang") === "en" && col("doc_id") % 5 === 0))
      snapshotDrift(docs, drop, "lang")
    }),
  )

  val oracle: Seq[(String, String)] = Seq(
    // statuses straight from the planting rule — the engine's sha256
    // membership/content comparison must reproduce the arithmetic
    "corpus_diff" ->
      """SELECT doc_id, status FROM (
        |  SELECT doc_id, 'removed' AS status FROM documents WHERE doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id, 'changed' FROM documents WHERE doc_id % 11 != 0 AND doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, 'added' FROM documents WHERE doc_id % 13 = 0
        |) ORDER BY doc_id""".stripMargin,
    // one SELECT per column (the oracle can afford N scans; the engine
    // must not) — same CAST-after-aggregate rendering
    "table_profile" -> LineitemCols.map { c =>
      s"""SELECT '$c' AS column_name,
         |       (SELECT COUNT(*) FROM lineitem) AS n_rows,
         |       COUNT($c) AS n_not_null,
         |       (SELECT COUNT(*) FROM lineitem) - COUNT($c) AS n_null,
         |       COUNT(DISTINCT $c) AS n_distinct,
         |       CAST(MIN($c) AS VARCHAR) AS min_value,
         |       CAST(MAX($c) AS VARCHAR) AS max_value
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name"),
    // the same integer rank threshold, cross-multiplied — the oracle can
    // afford per-column scans and a plain window over raw rows
    "profile_quantiles" ->
      """WITH recs AS (
        |  SELECT 'l_quantity' AS column_name, CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
        |),
        |counts AS (SELECT column_name, value, COUNT(*) AS cnt
        |           FROM recs WHERE value IS NOT NULL GROUP BY 1, 2),
        |cum AS (SELECT column_name, value,
        |               SUM(cnt) OVER (PARTITION BY column_name ORDER BY value) AS cum,
        |               SUM(cnt) OVER (PARTITION BY column_name) AS total
        |        FROM counts)
        |SELECT column_name, p_mille, MIN(value) AS value
        |FROM cum CROSS JOIN (SELECT CAST(UNNEST([500, 900, 990]) AS BIGINT) AS p_mille) p
        |WHERE cum * 1000 >= p_mille * total
        |GROUP BY 1, 2
        |ORDER BY column_name, p_mille""".stripMargin,
    // integer per-mille shares, truncating division in both engines;
    // DuckDB SUM() types HUGEINT, so totals cast back to BIGINT
    "profile_drift" ->
      """WITH after AS (
        |  SELECT * FROM documents WHERE NOT (lang = 'en' AND doc_id % 5 = 0)
        |),
        |cb AS (SELECT lang AS stratum, COUNT(*) AS n_before FROM documents GROUP BY 1),
        |ca AS (SELECT lang AS stratum, COUNT(*) AS n_after FROM after GROUP BY 1),
        |sb AS (SELECT stratum, n_before,
        |              CAST(n_before * 1000 // CAST((SELECT SUM(n_before) FROM cb) AS BIGINT) AS BIGINT) AS share_before_pm
        |       FROM cb),
        |sa AS (SELECT stratum, n_after,
        |              CAST(n_after * 1000 // CAST((SELECT SUM(n_after) FROM ca) AS BIGINT) AS BIGINT) AS share_after_pm
        |       FROM ca)
        |SELECT stratum,
        |       COALESCE(n_before, 0) AS n_before,
        |       COALESCE(n_after, 0) AS n_after,
        |       COALESCE(share_before_pm, 0) AS share_before_pm,
        |       COALESCE(share_after_pm, 0) AS share_after_pm,
        |       ABS(COALESCE(share_after_pm, 0) - COALESCE(share_before_pm, 0)) AS delta_pm
        |FROM sb FULL OUTER JOIN sa USING (stratum)
        |ORDER BY stratum""".stripMargin,
  )
}
