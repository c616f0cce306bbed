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
  def cosine_f32(a: Column, b: Column): Column = c(CosineSimF32(e(a), e(b)))
  def minhash_sig(hashes: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    c(MinHashSignature(e(hashes), numHashes, seed))
  def simhash64(hashes: Column): Column = c(SimHash64(e(hashes)))
  def winnow_fp(text: Column, k: Int = 8, w: Int = 4): Column =
    c(WinnowingFingerprint(e(text), k, w))
  def word_shingles(text: Column, n: Int = 3): Column =
    c(WordShingleHashes(e(text), n))

  /** Register the expressions for `spark.sql` use (SQL names mirror the
    * Column API). Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_f32", es => DotProductF32(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("cosine_f32", es => CosineSimF32(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig", es => MinHashSignature(es.head, 64, 42L), "built-in")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("winnow_fp", es => WinnowingFingerprint(es.head, 8, 4), "built-in")
    reg.createOrReplaceTempFunction("word_shingles", es => WordShingleHashes(es.head, 3), "built-in")
  }
}
