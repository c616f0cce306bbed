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
