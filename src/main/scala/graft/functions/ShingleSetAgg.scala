package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Growable buffer of (key, value) long pairs, stored interleaved
  * [k0, v0, k1, v1, …] — no per-element boxing, no per-row InternalRow
  * copies. `n` counts PAIRS. */
final class LongPairBuffer(var a: Array[Long], var n: Int) {
  def append(k: Long, v: Long): Unit = {
    if (2 * n == a.length) {
      val g = new Array[Long](a.length * 2)
      System.arraycopy(a, 0, g, 0, a.length)
      a = g
    }
    a(2 * n) = k
    a(2 * n + 1) = v
    n += 1
  }
}

/** `sorted_set_by_key(key, value)` — collects (key, value) long pairs per
  * group and evaluates to the VALUES sorted ascending under the (key,
  * value) lexicographic order. This is the sorted-set build of the PPJoin
  * pipeline ([[graft.ops.Dedup.ngramJaccardPairs]]): value = shingle hash,
  * key = its document frequency, output = the per-document shingle array
  * rarest-first under the global (df, sh) total order.
  *
  * Why not `transform(sort_array(collect_list(struct(df, sh))), r -> r.sh)`:
  * that chain runs an ObjectHashAggregate that copies one two-field
  * UnsafeRow per input row, an INTERPRETED struct ordering per sort
  * comparison, and an interpreted lambda per output element — measured as
  * the dominant cold/contended-pass weight of the Jaccard entry. This
  * aggregate appends two longs per row into a primitive buffer, merges by
  * arraycopy, and sorts pairs with a primitive dual-long quicksort at
  * eval — same result, no interpreted per-element work anywhere.
  *
  * Scale shape: partial+final like any TypedImperativeAggregate
  * (ObjectHashAggregate plans it map-side); the partial ships one packed
  * byte buffer per (group × partition). State is bounded by the group's
  * distinct-pair count — the same bound collect_list already implied. */
case class SortedSetByKey(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongPairBuffer] with BinaryLike[Expression] {

  override def prettyName: String = "sorted_set_by_key"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def createAggregationBuffer(): LongPairBuffer =
    new LongPairBuffer(new Array[Long](16), 0)

  override def update(b: LongPairBuffer, input: InternalRow): LongPairBuffer = {
    val k = left.eval(input)
    val v = right.eval(input)
    // null inputs are skipped, matching collect_list's null behavior
    if (k != null && v != null)
      b.append(k.asInstanceOf[Long], v.asInstanceOf[Long])
    b
  }

  override def merge(b: LongPairBuffer, o: LongPairBuffer): LongPairBuffer = {
    var i = 0
    while (i < o.n) { b.append(o.a(2 * i), o.a(2 * i + 1)); i += 1 }
    b
  }

  override def eval(b: LongPairBuffer): Any = {
    sortPairs(b.a, b.n)
    val out = new Array[Long](b.n)
    var i = 0
    while (i < b.n) { out(i) = b.a(2 * i + 1); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** In-place quicksort of interleaved (key, value) pairs by (key, value)
    * — median-of-three pivot, insertion sort below 16 pairs, recursion on
    * the smaller side only (stack depth O(log n) even on adversarial
    * input). Pair order ties are impossible downstream (distinct shingles
    * per doc) but the order is total regardless. */
  private def sortPairs(a: Array[Long], n: Int): Unit = {
    def lt(i: Int, j: Int): Boolean = {
      val ki = a(2 * i); val kj = a(2 * j)
      ki < kj || (ki == kj && a(2 * i + 1) < a(2 * j + 1))
    }
    def ltKv(i: Int, k: Long, v: Long): Boolean = {
      val ki = a(2 * i)
      ki < k || (ki == k && a(2 * i + 1) < v)
    }
    def gtKv(i: Int, k: Long, v: Long): Boolean = {
      val ki = a(2 * i)
      ki > k || (ki == k && a(2 * i + 1) > v)
    }
    def swap(i: Int, j: Int): Unit = if (i != j) {
      val k = a(2 * i); val v = a(2 * i + 1)
      a(2 * i) = a(2 * j); a(2 * i + 1) = a(2 * j + 1)
      a(2 * j) = k; a(2 * j + 1) = v
    }
    def insertion(lo: Int, hi: Int): Unit = {
      var i = lo + 1
      while (i <= hi) {
        val k = a(2 * i); val v = a(2 * i + 1)
        var j = i - 1
        while (j >= lo && gtKv(j, k, v)) {
          a(2 * (j + 1)) = a(2 * j); a(2 * (j + 1) + 1) = a(2 * j + 1)
          j -= 1
        }
        a(2 * (j + 1)) = k; a(2 * (j + 1) + 1) = v
        i += 1
      }
    }
    def sortRange(l: Int, h: Int): Unit = {
      var lo = l; var hi = h
      while (hi - lo >= 16) {
        // median-of-three: ends + middle ordered, pivot parked at hi-1
        val mid = lo + (hi - lo) / 2
        if (lt(mid, lo)) swap(mid, lo)
        if (lt(hi, lo)) swap(hi, lo)
        if (lt(hi, mid)) swap(hi, mid)
        swap(mid, hi - 1)
        val pk = a(2 * (hi - 1)); val pv = a(2 * (hi - 1) + 1)
        var i = lo
        var j = hi - 1
        while (i < j) {
          i += 1
          while (ltKv(i, pk, pv)) i += 1
          j -= 1
          while (gtKv(j, pk, pv)) j -= 1
          if (i < j) swap(i, j)
        }
        swap(i, hi - 1) // pivot into place
        // recurse on the smaller half, loop on the larger
        if (i - lo < hi - i) { sortRange(lo, i - 1); lo = i + 1 }
        else { sortRange(i + 1, hi); hi = i - 1 }
      }
      insertion(lo, hi)
    }
    sortRange(0, n - 1)
  }

  override def serialize(b: LongPairBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < 2 * b.n) { bb.putLong(b.a(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongPairBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val a = new Array[Long](math.max(2 * n, 16))
    var i = 0
    while (i < 2 * n) { a(i) = bb.getLong(); i += 1 }
    new LongPairBuffer(a, n)
  }

  override def withNewMutableAggBufferOffset(o: Int): SortedSetByKey =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SortedSetByKey =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedSetByKey = copy(left = l, right = r)
}
