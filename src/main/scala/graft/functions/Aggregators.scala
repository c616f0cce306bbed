package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF examples — the reference enumerates `AggregateUDF` as
  * `todo!()` (`src/parser.rs:894`); Spark's `Aggregator[IN, BUF, OUT]` is
  * the idiomatic replacement. Both aggregators here are algebraic
  * (commutative + associative merge), so Spark plans them as partial +
  * final aggregation — map-side combine works at any scale. */
object Aggregators {

  /** Weighted average: IN = (value, weight). */
  case class WSum(sum: Double, wsum: Double)
  object WeightedAvg extends Aggregator[(Double, Double), WSum, Double] {
    override def zero: WSum = WSum(0.0, 0.0)
    override def reduce(b: WSum, in: (Double, Double)): WSum =
      WSum(b.sum + in._1 * in._2, b.wsum + in._2)
    override def merge(a: WSum, b: WSum): WSum =
      WSum(a.sum + b.sum, a.wsum + b.wsum)
    override def finish(b: WSum): Double =
      if (b.wsum == 0.0) Double.NaN else b.sum / b.wsum
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k by (score desc, id asc) — the aggregate form of
    * distributed top-k: partial aggregation keeps a k-element buffer per
    * (map task × group), so the shuffle carries k rows per partition per
    * group instead of every scored row (a window over the group would
    * exchange the full score set first). Deterministic ties by id. */
  case class Scored(score: Double, id: Long)
  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0)
    private def best(xs: Seq[Scored]): Seq[Scored] =
      xs.sortBy(s => (-s.score, s.id)).take(k)
    override def zero: Seq[Scored] = Vector.empty
    override def reduce(b: Seq[Scored], in: Scored): Seq[Scored] =
      // cheap guard: only re-sort when the candidate can enter the top k
      if (b.length >= k && {
        val w = b.last
        in.score < w.score || (in.score == w.score && in.id > w.id)
      }) b
      else best(b :+ in)
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      best(a ++ b)
    override def finish(b: Seq[Scored]): Seq[Scored] = b
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** SpaceSaving frequent-items sketch (Metwally et al., "Efficient
    * Computation of Frequent and Top-k Elements in Data Streams") —
    * bounded-memory heavy hitters, THE corpus-stats primitive at 100 TB
    * (top domains / tokens / shingles over 10^12 rows with O(capacity)
    * state per task; an exact GROUP BY would shuffle one row per distinct
    * key). Guarantees per summary: true ≤ cnt, and cnt − err ≤ true; any
    * item with true frequency > N/capacity is retained.
    *
    * Merge is the mergeable-summaries formulation: an item absent from
    * one side contributes that side's eviction floor to both estimate and
    * error (it may have been evicted there with up to `floor` counts), so
    * the bounds survive arbitrary partial/final merge trees. When
    * `capacity` ≥ the distinct-key count no eviction ever happens, every
    * floor stays 0, and the sketch degrades to exact counts independent
    * of merge order — the configuration the driver oracle pins; the
    * approximate regime is spec-tested against its error bounds. */
  case class Counted(item: String, cnt: Long, err: Long)
  case class FreqBuf(counts: Map[String, Long], errs: Map[String, Long],
      floor: Long)
  class FrequentItems(k: Int, capacity: Int)
      extends Aggregator[String, FreqBuf, Seq[Counted]] {
    require(k > 0 && capacity >= k, "need capacity >= k > 0")
    override def zero: FreqBuf = FreqBuf(Map.empty, Map.empty, 0L)
    override def reduce(b: FreqBuf, item: String): FreqBuf =
      b.counts.get(item) match {
        case Some(c) => b.copy(counts = b.counts.updated(item, c + 1))
        case None if b.counts.size < capacity =>
          // a new slot "evicts" a ghost of weight floor (0 until the
          // buffer has ever been full) — the classic insert rule
          FreqBuf(b.counts.updated(item, b.floor + 1),
            if (b.floor == 0) b.errs else b.errs.updated(item, b.floor),
            b.floor)
        case None =>
          // evict the (count, item)-minimal counter; the newcomer
          // inherits its count as overestimation error
          val (vItem, vCnt) = b.counts.minBy { case (i, c) => (c, i) }
          FreqBuf(b.counts - vItem + (item -> (vCnt + 1)),
            b.errs - vItem + (item -> vCnt),
            math.max(b.floor, vCnt))
      }
    override def merge(a: FreqBuf, b: FreqBuf): FreqBuf = {
      val keys = a.counts.keySet ++ b.counts.keySet
      def est(i: String): Long =
        a.counts.getOrElse(i, a.floor) + b.counts.getOrElse(i, b.floor)
      def err(i: String): Long =
        a.errs.getOrElse(i, if (a.counts.contains(i)) 0L else a.floor) +
          b.errs.getOrElse(i, if (b.counts.contains(i)) 0L else b.floor)
      val floor0 = a.floor + b.floor
      if (keys.size <= capacity)
        FreqBuf(keys.iterator.map(i => i -> est(i)).toMap,
          keys.iterator.map(i => i -> err(i)).filter(_._2 > 0).toMap, floor0)
      else {
        val ranked = keys.toSeq.map(i => i -> est(i))
          .sortBy { case (i, c) => (-c, i) }
        val (kept, evicted) = ranked.splitAt(capacity)
        FreqBuf(kept.toMap,
          kept.iterator.map { case (i, _) => i -> err(i) }
            .filter(_._2 > 0).toMap,
          math.max(floor0, evicted.iterator.map(_._2).max))
      }
    }
    override def finish(b: FreqBuf): Seq[Counted] =
      b.counts.toSeq.sortBy { case (i, c) => (-c, i) }.take(k)
        .map { case (i, c) => Counted(i, c, b.errs.getOrElse(i, 0L)) }
    override def bufferEncoder: Encoder[FreqBuf] = Encoders.product[FreqBuf]
    override def outputEncoder: Encoder[Seq[Counted]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Counted]]()
  }

  /** Numerically stable geometric mean via mean-of-logs (log-sum would
    * overflow/underflow long before the mean does). Non-positive inputs
    * are ignored (domain of the geometric mean). */
  case class GeoBuf(logSum: Double, n: Long)
  object GeometricMean extends Aggregator[Double, GeoBuf, Double] {
    override def zero: GeoBuf = GeoBuf(0.0, 0L)
    override def reduce(b: GeoBuf, x: Double): GeoBuf =
      if (x > 0.0) GeoBuf(b.logSum + math.log(x), b.n + 1) else b
    override def merge(a: GeoBuf, b: GeoBuf): GeoBuf =
      GeoBuf(a.logSum + b.logSum, a.n + b.n)
    override def finish(b: GeoBuf): Double =
      if (b.n == 0) Double.NaN else math.exp(b.logSum / b.n)
    override def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
