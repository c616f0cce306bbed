package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftSqlBridge

/** Column-API and SQL surface for the custom Catalyst expressions — the
  * analog of `org.apache.spark.sql.functions` for this engine's extension
  * operators (the reference's UDF surface is entirely `todo!()`,
  * `src/parser.rs:813,894`; here we go straight to native expressions). */
object GraftFunctions {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftSqlBridge.column(e)
  private def e(col: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    GraftSqlBridge.expression(col)

  def dot_f32(a: Column, b: Column): Column = c(DotProductF32(e(a), e(b)))
  def dot_i8(a: Column, b: Column): Column = c(DotProductI8(e(a), e(b)))
  def dot_i8f64(a: Column, b: Column): Column = c(DotProductI8F64(e(a), e(b)))
  def cosine_f32(a: Column, b: Column): Column = c(CosineSimF32(e(a), e(b)))
  def minhash_sig(hashes: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    c(MinHashSignature(e(hashes), numHashes, seed))
  def simhash64(hashes: Column): Column = c(SimHash64(e(hashes)))
  def winnow_fp(text: Column, k: Int = 8, w: Int = 4): Column =
    c(WinnowingFingerprint(e(text), k, w))
  def word_shingles(text: Column, n: Int = 3): Column =
    c(WordShingleHashes(e(text), n))
  def span_shingles(toks: Column, k: Int = 8): Column =
    c(SpanShingleHashes(e(toks), k))
  def text_stats(text: Column, stopwords: Seq[String]): Column =
    c(TextStats(e(text), stopwords))
  def seg_count(text: Column): Column = c(SegCount(e(text)))
  def id_window_keys(ids: Column, n: Int): Column =
    c(IdWindowHashes(e(ids), n))
  def sig_agreement(a: Column, b: Column): Column =
    c(SigAgreement(e(a), e(b)))
  def nearest_centroids(vec: Column, qnorm: Column, ids: Seq[Long],
      cents: Seq[Seq[Double]], spill: Int = 1,
      nanGreatest: Boolean = false): Column =
    c(NearestCentroids(e(vec), e(qnorm), ids, cents, spill, nanGreatest))
  def nearest_centroids_f32(vec: Column, ids: Seq[Long],
      cents: Seq[Seq[Float]], spill: Int = 1,
      nanGreatest: Boolean = false): Column =
    c(NearestCentroidsF32(e(vec), ids, cents, spill, nanGreatest))
  def nfc_normalize(text: Column): Column = c(NfcNormalize(e(text)))
  def top_bigram_count(toks: Column): Column = c(TopBigramCount(e(toks)))
  /** Aggregate: values sorted by (key, value) — the PPJoin sorted-set
    * build, primitive-buffer fast path of
    * `transform(sort_array(collect_list(struct(k, v))), r -> r.v)`. */
  def sorted_set_by_key(key: Column, value: Column): Column =
    c(SortedSetByKey(e(key), e(value)).toAggregateExpression())
  def url_normalize(url: Column): Column = c(NormalizeUrl(e(url)))
  def html_to_text(html: Column): Column = c(HtmlToText(e(html)))

  /** Distributed Bloom-filter build over a LongType column — Spark's own
    * `BloomFilterAggregate` (the runtime-filter machinery behind
    * InjectRuntimeFilter), planned partial+final like any aggregate: each
    * task ORs into a local sketch, partials merge by bitwise OR, and only
    * the final `numBits/8`-byte sketch ever reaches the driver. */
  def bloom_agg(items: Column, expectedItems: Long, numBits: Long): Column =
    c(new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      e(items),
      org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits)).toAggregateExpression())

  /** Bloom membership probe (`BloomFilterMightContain`): no false
    * negatives, false positives at the sketch's configured rate. Spark
    * requires `bloom` to be foldable or a scalar subquery — pass
    * `bloomDf.scalar()` (Spark 4's subquery Column API). */
  def might_contain(bloom: Column, item: Column): Column =
    c(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      e(bloom), e(item)))

  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
  import org.apache.spark.sql.types.{IntegerType, LongType}

  private def arity(name: String, es: Seq[Expression], min: Int, max: Int): Unit =
    if (es.length < min || es.length > max)
      throw new IllegalArgumentException(
        s"$name expects $min..$max arguments, got ${es.length}")

  private def intArg(name: String, es: Seq[Expression], i: Int, default: Long): Long =
    if (es.length <= i) default
    else es(i) match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType) => v
      case other => throw new IllegalArgumentException(
        s"$name: argument ${i + 1} must be an integer literal, got $other")
    }

  /** Register the expressions for `spark.sql` use. SQL names mirror the
    * Column API including the optional parameters (which must be integer
    * literals); wrong arities fail at analysis instead of silently using
    * defaults. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_f32", es => {
      arity("dot_f32", es, 2, 2); DotProductF32(es(0), es(1))
    }, "built-in")
    reg.createOrReplaceTempFunction("cosine_f32", es => {
      arity("cosine_f32", es, 2, 2); CosineSimF32(es(0), es(1))
    }, "built-in")
    reg.createOrReplaceTempFunction("dot_i8", es => {
      arity("dot_i8", es, 2, 2); DotProductI8(es(0), es(1))
    }, "built-in")
    reg.createOrReplaceTempFunction("dot_i8f64", es => {
      arity("dot_i8f64", es, 2, 2); DotProductI8F64(es(0), es(1))
    }, "built-in")
    reg.createOrReplaceTempFunction("minhash_sig", es => {
      arity("minhash_sig", es, 1, 3)
      MinHashSignature(es.head,
        intArg("minhash_sig", es, 1, 64).toInt, intArg("minhash_sig", es, 2, 42L))
    }, "built-in")
    reg.createOrReplaceTempFunction("simhash64", es => {
      arity("simhash64", es, 1, 1); SimHash64(es.head)
    }, "built-in")
    reg.createOrReplaceTempFunction("winnow_fp", es => {
      arity("winnow_fp", es, 1, 3)
      WinnowingFingerprint(es.head,
        intArg("winnow_fp", es, 1, 8).toInt, intArg("winnow_fp", es, 2, 4).toInt)
    }, "built-in")
    reg.createOrReplaceTempFunction("word_shingles", es => {
      arity("word_shingles", es, 1, 2)
      WordShingleHashes(es.head, intArg("word_shingles", es, 1, 3).toInt)
    }, "built-in")
    reg.createOrReplaceTempFunction("nfc_normalize", es => {
      arity("nfc_normalize", es, 1, 1); NfcNormalize(es.head)
    }, "built-in")
    reg.createOrReplaceTempFunction("url_normalize", es => {
      arity("url_normalize", es, 1, 1); NormalizeUrl(es.head)
    }, "built-in")
    reg.createOrReplaceTempFunction("html_to_text", es => {
      arity("html_to_text", es, 1, 1); HtmlToText(es.head)
    }, "built-in")
    // aggregate: analysis wraps the raw ImperativeAggregate into an
    // AggregateExpression. The size arguments must be BIGINT literals —
    // widen bare INT literals so `bloom_agg(x, 10, 1024)` just works
    reg.createOrReplaceTempFunction("bloom_agg", es => {
      arity("bloom_agg", es, 3, 3)
      def widen(x: Expression): Expression = x match {
        case Literal(v: Int, IntegerType) => Literal(v.toLong)
        case other => other
      }
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        es(0), widen(es(1)), widen(es(2)))
    }, "built-in")
    reg.createOrReplaceTempFunction("might_contain", es => {
      arity("might_contain", es, 2, 2)
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))
    }, "built-in")
  }
}
