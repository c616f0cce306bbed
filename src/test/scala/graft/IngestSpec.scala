package graft

import graft.sources.JsonlIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JSONL ingestion with quarantine — robustness tier in front of
  * curation. */
class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Spark to_json renders the compact byte format the oracle reconstructs") {
    // the oracle rebuilds staged lines with DuckDB's to_json; both must
    // render this exact compact ASCII form or the byte-exact quarantine
    // oracle breaks
    val line = Seq((7L, "ab c.", "en")).toDF("doc_id", "text", "lang")
      .select(to_json(struct(col("doc_id"), col("text"), col("lang"))).as("l"))
      .as[String].head()
    assert(line == """{"doc_id":7,"text":"ab c.","lang":"en"}""")
  }

  test("quarantine catches exactly the planted truncations, payload byte-exact") {
    val dir = JsonlIngest.ensureJsonlDrop(spark, TestSpark.Sf0001)
    val (valid, quarantine) = JsonlIngest.readWithQuarantine(spark, dir)
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val planted = docs.filter(col("doc_id") % 97 === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(planted.nonEmpty, "fixture must plant at least one corruption")
    // valid = everything not planted, parsed under the imposed schema
    val validIds = valid.select("doc_id").as[Long].collect().toSet
    val allIds = docs.select("doc_id").as[Long].collect().toSet
    assert(validIds == allIds -- planted)
    // quarantined rows carry the raw truncated line: correct count, every
    // line is a strict prefix of the full rendering and structurally
    // invalid (no closing brace)
    val q = quarantine.as[String].collect().toSeq
    assert(q.size == planted.size)
    assert(q.forall(l => l.startsWith("{\"doc_id\":") && !l.endsWith("}")))
    // conservation: nothing silently dropped
    assert(validIds.size + q.size == allIds.size)
    spark.sharedState.cacheManager.clearCache()
  }

  test("streaming ingest equals the batch valid channel (oracle-independent)") {
    val batch = SparkEntry.queries("ingest_jsonl")(spark, TestSpark.Sf0001)
      .as[(Long, String)].collect().toSet
    val stream = SparkEntry.queries("stream_ingest_jsonl")(spark, TestSpark.Sf0001)
      .as[(Long, String)].collect().toSet
    assert(stream == batch)
    assert(batch.nonEmpty)
    spark.sharedState.cacheManager.clearCache()
  }

  test("staging is idempotent: a second ensure call rewrites nothing") {
    val dir = JsonlIngest.ensureJsonlDrop(spark, TestSpark.Sf0001)
    val f = new java.io.File(dir, "_SUCCESS")
    val before = f.lastModified()
    val again = JsonlIngest.ensureJsonlDrop(spark, TestSpark.Sf0001)
    assert(again == dir && f.lastModified() == before)
  }
}
