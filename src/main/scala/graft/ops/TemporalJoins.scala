package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Temporal join operators absent from both the reference (SURVEY.md §2.B
  * B11: only conjunctive equi-`on` pairs are translated,
  * reference `src/parser.rs:1158-1166`) and from Spark's built-in operator
  * set — Spark plans a bare non-equi join as BroadcastNestedLoopJoin,
  * which is quadratic work and a broadcast of a fact table at 100 TB.
  *
  * Scale design:
  *  - As-of join: tagged union + one window sort per key — ONE shuffle on
  *    the join key, no range expansion, no nested loop; the running state
  *    per key is a single "latest right payload" value. This is the
  *    merge-join formulation of as-of, the same shape Spark already plans
  *    for any window function, so it survives arbitrary scale-up.
  *  - Band (range) join: event times are coarsened to band-width buckets
  *    and the earlier side is expanded to (bucket, bucket+1); every true
  *    pair then shares a bucket, so candidates come from a plain equi
  *    shuffle join refined by the exact predicate — linear in data +
  *    candidate pairs, never O(n²).
  */
object TemporalJoins {

  /** Backward as-of join: for every `left` row, attach the payload of the
    * single `right` row with the greatest `rightTimeCol` <= `leftTimeCol`
    * sharing `keys` (nulls when no such row, like a left outer join).
    *
    * @param payload      right column -> output name (carried via one struct
    *                     so the window state stays a single value)
    * @param matchTimeAs  output name for the matched right row's timestamp
    * @param toleranceSec optional max age in seconds; older matches null out
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      payload: Seq[(String, String)], matchTimeAs: String = "asof_ts",
      toleranceSec: Option[Long] = None): DataFrame = {
    val pType = StructType(
      StructField(matchTimeAs, right.schema(rightTimeCol).dataType) +:
        payload.map { case (c, out) => StructField(out, right.schema(c).dataType) })
    val pStruct = struct(
      col(rightTimeCol).as(matchTimeAs) +:
        payload.map { case (c, out) => col(c).as(out) }: _*)

    val leftRest = left.columns.filterNot(keys.contains).toSeq
    val leftSide = left.select(
      keys.map(col) ++
        Seq(col(leftTimeCol).as("__t"), lit(null).cast(pType).as("__p"),
          lit(1).as("__side")) ++ leftRest.map(col): _*)
    val rightSide = right.select(
      keys.map(col) ++
        Seq(col(rightTimeCol).as("__t"), pStruct.as("__p"), lit(0).as("__side")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Right rows sort before left rows at the same instant, so an exactly
    // simultaneous right row IS a match ("at or before"); __p breaks ties
    // between simultaneous right rows deterministically.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = leftSide.unionByName(rightSide)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = toleranceSec match {
      case Some(s) => matched.withColumn("__m",
        when(unix_micros(col("__t")) - unix_micros(col("__m")(matchTimeAs)) <= s * 1000000L,
          col("__m")))
      case None => matched
    }
    bounded.select(
      keys.map(col) ++ leftRest.map(col) ++
        (matchTimeAs +: payload.map(_._2)).map(f => col("__m")(f).as(f)): _*)
  }

  /** Band (interval range) self-join at second granularity: ordered pairs
    * of rows sharing `keys` whose second-truncated time gap is in
    * [1, bandSec]. Output: left row id, right row id, gap_s.
    *
    * Second granularity makes the predicate exact across engines (the
    * driver oracle renders timestamps to seconds; source timestamps carry
    * sub-microsecond noise that µs-level predicates would be sensitive to).
    */
  def timeBandPairs(df: DataFrame, keys: Seq[String], timeCol: String,
      idCol: String, bandSec: Long): DataFrame = {
    val base = df.select(
      keys.map(col) :+ col(idCol).as("__id") :+
        (unix_micros(col(timeCol)) / lit(1000000L)).cast("long").as("__s"): _*)
    // earlier side expands to its own bucket and the next one; a pair with
    // 0 < gap <= band always lands in one of the two — no dedup needed
    // because the two probe buckets are distinct and the later row has one.
    val a = base.select(
      keys.map(col) :+ col("__id").as("id_a") :+ col("__s").as("__sa") :+
        explode(array(floor(col("__s") / bandSec), floor(col("__s") / bandSec) + 1))
          .as("__bucket"): _*)
    val b = base.select(
      keys.map(col) :+ col("__id").as("id_b") :+ col("__s").as("__sb") :+
        floor(col("__s") / bandSec).as("__bucket"): _*)
    a.join(b, keys :+ "__bucket")
      .withColumn("gap_s", col("__sb") - col("__sa"))
      .filter(col("gap_s") >= 1 && col("gap_s") <= bandSec)
      .select(keys.map(col) :+ col("id_a") :+ col("id_b") :+ col("gap_s"): _*)
  }

  // ---- corpus entries (spark, sfDir) => DataFrame ----

  /** s28 — as-of join: every purchase event annotated with the user's most
    * recent click at or before the purchase. */
  val purchasesWithLastClick: (SparkSession, String) => DataFrame = (spark, dir) => {
    val ev = Tables.load(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    asofBackward(purchases, clicks, Seq("user_id"), "ts", "ts",
      payload = Seq("value" -> "click_value"), matchTimeAs = "click_ts")
      .select("event_id", "user_id", "purchase_value", "click_ts", "click_value")
      .orderBy("event_id")
  }

  /** s29 — band range join: pairs of events by the same user within
    * 30 minutes (second-granularity gap), via bucketed equi join. */
  val eventPairsWithin30Min: (SparkSession, String) => DataFrame = (spark, dir) => {
    val ev = Tables.load(spark, dir, "events")
    timeBandPairs(ev, Seq("user_id"), "ts", "event_id", bandSec = 1800L)
      .select("user_id", "id_a", "id_b", "gap_s")
      .orderBy("id_a", "id_b")
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "s28_asof_join" -> purchasesWithLastClick,
    "s29_range_join" -> eventPairsWithin30Min)

  /** ANSI-SQL oracles (DuckDB executes these on the same parquet). */
  val oracle: Seq[(String, String)] = Seq(
    "s28_asof_join" ->
      // MAX(c.value) + GROUP BY mirrors the op's deterministic tie-break
      // (max payload among same-instant clicks) and keeps the join-back
      // from duplicating rows if two clicks ever share an exact timestamp
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
        |     m AS (SELECT p.event_id, p.user_id, p.value AS purchase_value,
        |                  (SELECT max(c.ts) FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS click_ts
        |           FROM p)
        |SELECT m.event_id, m.user_id, m.purchase_value, m.click_ts, MAX(c.value) AS click_value
        |FROM m LEFT JOIN c ON c.user_id = m.user_id AND c.ts = m.click_ts
        |GROUP BY m.event_id, m.user_id, m.purchase_value, m.click_ts
        |ORDER BY m.event_id""".stripMargin,
    "s29_range_join" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |       date_diff('second', a.ts, b.ts) AS gap_s
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND date_diff('second', a.ts, b.ts) BETWEEN 1 AND 1800
        |ORDER BY id_a, id_b""".stripMargin)
}
