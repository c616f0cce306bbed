package graft.ops

import graft.Tables
import graft.functions.Aggregators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Heavy-hitter queries over the [[Aggregators.FrequentItems]] SpaceSaving
  * sketch. The driver-oracle entry runs the sketch in its exact regime
  * (capacity ≥ distinct keys → merge-order-free exact counts) against a
  * plain GROUP BY top-k oracle; the approximate regime's bounds are
  * spec-tested in `AggregatorsSpec` where exactness is impossible. */
object HeavyHitters {

  /** Top-k items of `itemCol` by frequency with SpaceSaving state bounded
    * by `capacity` per task — output (rank, item, cnt, err). */
  def topItems(df: DataFrame, itemCol: String, k: Int = 20,
      capacity: Int = 1 << 16): DataFrame = {
    val freq = udaf(new Aggregators.FrequentItems(k, capacity),
      Encoders.STRING)
    df.select(col(itemCol).cast("string").as("item"))
      .agg(freq(col("item")).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "s")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("s.item").as("item"), col("s.cnt").as("cnt"),
        col("s.err").as("err"))
      .orderBy("rank")
  }

  /** Per-group top-k — the realistic grouped form (top tokens per
    * language, top domains per crawl, …): one bounded sketch buffer per
    * (task × group) rides the shuffle, never the exploded item stream. */
  def topItemsByGroup(df: DataFrame, groupCol: String, itemCol: String,
      k: Int = 10, capacity: Int = 1 << 16): DataFrame = {
    val freq = udaf(new Aggregators.FrequentItems(k, capacity),
      Encoders.STRING)
    df.select(col(groupCol).as("grp"), col(itemCol).cast("string").as("item"))
      .groupBy("grp")
      .agg(freq(col("item")).as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("grp"), (col("pos") + 1).cast("int").as("rank"),
        col("s.item").as("item"), col("s.cnt").as("cnt"),
        col("s.err").as("err"))
      .orderBy("grp", "rank")
  }

  /** Exact-regime guard for the ORACLE entries: the driver compares the
    * sketch against an exact GROUP BY, which is only valid while every
    * distinct key fits one sketch (err ≡ 0, merge-order-free). Past that
    * the sketch is legitimately approximate and merge-order-dependent —
    * fail FAST and LOUD instead of flaking the gate at a bigger scale
    * factor. `cardinality` is any cheap UPPER BOUND on the distinct keys
    * a single sketch sees. */
  private def requireExactRegime(cardinality: Long, capacity: Int,
      what: String): Unit =
    require(cardinality <= capacity,
      s"$what: up to $cardinality distinct keys exceed sketch capacity " +
        s"$capacity — the exact-regime oracle no longer holds at this " +
        "scale factor; raise the capacity or retire the oracle entry")

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "approx_top_parts" -> ((s, d) => {
      // distinct l_partkey is bounded by |part| — a parquet footer count,
      // no scan (at sf1 |part|=200k > 65536: this trips rather than flakes)
      requireExactRegime(Tables.load(s, d, "part").count(), 1 << 16,
        "approx_top_parts")
      topItems(Tables.load(s, d, "lineitem"), "l_partkey")
    }),
    "approx_top_tokens_by_lang" -> ((s, d) => {
      val toks = Tables.load(s, d, "documents")
        .select(col("lang"), explode(split(trim(col("text")), Tokens.WsRun)).as("tok"))
      // per-group sketches: the bound is the LARGEST per-language
      // vocabulary. approx_count_distinct (HLL, partial-aggregating), not
      // an exact countDistinct — the exact form re-shuffles every
      // exploded token, which is the cost the sketch entry exists to
      // avoid; a 2x margin on the estimate dwarfs HLL's ~5% error while
      // still tripping LONG before a real regime exit (the synthetic
      // vocabulary is ~31 words against capacity 1024).
      // NOTE: unlike approx_top_parts' exact footer count, this guard is
      // PROBABILISTIC — an HLL misestimate beyond the 2x margin could in
      // principle pass a genuinely over-capacity vocabulary (the flake
      // the guard exists to prevent) or trip spuriously near the
      // boundary. Acceptable at a ~33x capacity ratio; a deployment
      // running near capacity/2 should widen the margin or pay for the
      // exact count.
      val bound = toks.groupBy("lang")
        .agg(approx_count_distinct("tok").as("n"))
        .agg(max("n")).collect().headOption
        .flatMap(r => Option(r.get(0))).map(_.asInstanceOf[Number].longValue)
        .getOrElse(0L)
      requireExactRegime(bound * 2, 1 << 10, "approx_top_tokens_by_lang")
      topItemsByGroup(toks, "lang", "tok", k = 5, capacity = 1 << 10)
        .withColumnRenamed("grp", "lang")
    }))

  // capacity 65536 exceeds the part-key cardinality at every test scale
  // factor, so the sketch is exact and err is identically 0; ties at the
  // k boundary break by (cnt DESC, item ASC) on both sides
  val oracle: Seq[(String, String)] = Seq(
    "approx_top_parts" ->
      """SELECT rank, item, cnt, 0 AS err FROM (
        |  SELECT CAST(l_partkey AS VARCHAR) AS item, COUNT(*) AS cnt,
        |         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC,
        |                            CAST(l_partkey AS VARCHAR)) AS rank
        |  FROM lineitem GROUP BY 1) t
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // capacity 1024 >> the ~31-word synthetic vocabulary → exact regime;
    // whitespace split mirrors the engine's \s+ on trimmed text
    "approx_top_tokens_by_lang" ->
      """SELECT lang, rank, item, cnt, 0 AS err FROM (
        |  SELECT lang, tok AS item, COUNT(*) AS cnt,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |           ORDER BY COUNT(*) DESC, tok) AS INT) AS rank
        |  FROM (SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |        FROM documents) u
        |  GROUP BY lang, tok) t
        |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin)
}
