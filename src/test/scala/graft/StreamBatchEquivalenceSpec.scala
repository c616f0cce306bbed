package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Stream ≡ batch equivalence over the SAME files: each streaming entry
  * with a batch twin must produce exactly the batch answer on a bounded
  * replay. This is the guard class that catches ingestion corruption (the
  * round-9 silent 1000× time compression) even without the external
  * oracle — if either path misreads time, windows/sessions/join intervals
  * diverge and the set comparison fails by name. */
class StreamBatchEquivalenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  /** Stream and batch reduce double sums in different orders, so doubles
    * must be compared numerically at relative tolerance — ANY fixed-precision
    * string rendering (the former format_number canon) turns reduction-order
    * noise into a shuffle-order-dependent knife-edge. Rows pair by their
    * exact non-double fields (same pattern as MvRewriteProps.sameRows). */
  private def rows(df: DataFrame): Seq[Seq[Any]] = df.collect().map(_.toSeq).toSeq
  private def pairKey(r: Seq[Any]): String = r.map {
    case _: Double => ""
    case x => String.valueOf(x)
  }.mkString("|")
  private def assertSame(stream: DataFrame, batch: DataFrame): Unit = {
    val cols = stream.columns.toSeq.map(col)
    val s = rows(stream)
    val b = rows(batch.select(cols: _*))
    assert(s.nonEmpty)
    assert(s.size == b.size, s"row counts differ: stream=${s.size} batch=${b.size}")
    s.sortBy(pairKey).zip(b.sortBy(pairKey)).zipWithIndex.foreach { case ((x, y), i) =>
      val ok = x.size == y.size && x.zip(y).forall {
        case (dx: Double, dy: Double) =>
          dx == dy || math.abs(dx - dy) <= 1e-9 * math.max(math.abs(dx), math.abs(dy))
        case (vx, vy) => vx == vy
      }
      assert(ok, s"row $i differs:\n  stream: $x\n  batch:  $y")
    }
  }

  test("stream_hourly equals the batch hourly aggregate (s23a twin)") {
    val stream = EventStreams.hourlyCounts(spark, dir)
    val batch = Tables.loadEvents(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
    assertSame(stream, batch)
  }

  test("stream_sessions equals the batch sessionization (s23b twin)") {
    Tables.registerAll(spark, dir)
    val stream = EventStreams.sessionize(spark, dir)
    val batch = spark.sql(graft.queries.Corpus.s23bSessionsSql)
    assertSame(stream, batch)
  }

  test("stream_sliding equals the batch window expansion") {
    // Spark's sliding windows are epoch-aligned at the slide interval:
    // the 4 windows containing ts start at floor(ts, 15min) - k*15min
    val stream = EventStreams.slidingCounts(spark, dir)
    val ev = Tables.loadEvents(spark, dir)
    val batch = ev
      .select(col("ts"), col("event_type"), col("value"),
        explode(expr("array(0, 1, 2, 3)")).as("k"))
      .withColumn("win_start",
        expr("timestamp_micros(unix_micros(ts) div 900000000 * 900000000) - make_interval(0,0,0,0,0, k * 15, 0)"))
      .drop("ts")
      .groupBy("win_start", "event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
    assertSame(stream, batch)
  }

  test("stream_dedup equals batch DISTINCT on the bounded replay") {
    val stream = EventStreams.dedupKeys(spark, dir)
    val batch = Tables.loadEvents(spark, dir)
      .select("user_id", "event_type").distinct()
    assertSame(stream, batch)
  }

  test("stream_mv_rollup equals the batch aggregate of every event") {
    val stream = EventStreams.streamMvRollup(spark, dir)
      .select("event_type", "cnt", "sum_v", "cnt_v", "min_v", "max_v")
    val batch = Tables.loadEvents(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_v"),
        count("value").as("cnt_v"), min("value").as("min_v"),
        max("value").as("max_v"))
    assertSame(stream, batch)
  }

  test("stream_enrich_join equals the batch interval join (s29 twin)") {
    val ev = Tables.loadEvents(spark, dir)
      .withColumn("ts2", date_trunc("second", col("ts")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts2").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts2").as("c_ts"))
    val batch = p.join(c,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("interval 30 minutes") &&
          col("c_ts") < col("p_ts"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        ((unix_micros(col("p_ts")) - unix_micros(col("c_ts"))) / 1000000L)
          .cast("long").as("gap_s"))
    val stream = EventStreams.purchaseClickJoin(spark, dir)
    assertSame(stream, batch)
  }

  test("stream_chunk equals the batch chunker (text_chunk twin)") {
    // stateless per-document explode: the bounded replay must be the
    // batch answer exactly — no doubles, so plain set equality by rows
    val stream = EventStreams.chunkDocuments(spark, dir)
    val batch = graft.ops.Chunking.chunk(
      Tables.load(spark, dir, "documents"))
    assertSame(stream, batch)
  }

  test("stream_quality_clf equals the batch classifier (text_quality_clf twin)") {
    // stateless map against the persisted model over the same planted
    // corpus — all-Long scores, so exact row equality
    val stream = EventStreams.qualityClfScoring(spark, dir)
    val batch = graft.ops.QualityClf.trainAndScore(
      graft.ops.QualityClf.plantSpam(Tables.load(spark, dir, "documents")))
    assertSame(stream, batch)
  }
}
