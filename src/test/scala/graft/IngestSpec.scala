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

  test("quarantine catches exactly the planted corruptions, payload byte-exact") {
    val dir = JsonlIngest.ensureJsonlDrop(spark, TestSpark.Sf0001)
    val (valid, quarantine) = JsonlIngest.readWithQuarantine(spark, dir)
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val truncated = docs.filter(col("doc_id") % 97 === 0)
      .select("doc_id").as[Long].collect().toSet
    val mangled = docs.filter(col("doc_id") % 89 === 0 && col("doc_id") % 97 =!= 0)
      .select("doc_id").as[Long].collect().toSet
    assert(truncated.nonEmpty && mangled.nonEmpty,
      "fixture must plant both corruption classes")
    // valid = everything not planted, parsed under the imposed schema.
    // The mangled lines are VALID JSON that fails the imposed LongType —
    // this pins Spark's PERMISSIVE record-level contract (any field
    // conversion failure quarantines the whole record), which the
    // oracle's `parseable` predicate mirrors
    val validIds = valid.select("doc_id").as[Long].collect().toSet
    val allIds = docs.select("doc_id").as[Long].collect().toSet
    assert(validIds == allIds -- truncated -- mangled)
    val q = quarantine.as[String].collect().toSeq
    assert(q.size == truncated.size + mangled.size)
    // truncated lines are strict prefixes (no closing brace); mangled
    // lines are complete objects with the string doc_id
    val (qMangled, qTruncated) = q.partition(_.startsWith("{\"doc_id\":\"id-"))
    assert(qTruncated.forall(l => l.startsWith("{\"doc_id\":") && !l.endsWith("}")))
    assert(qMangled.forall(_.endsWith("}")))
    assert(qTruncated.size == truncated.size && qMangled.size == mangled.size)
    // conservation: nothing silently dropped
    assert(validIds.size + q.size == allIds.size)
    spark.sharedState.cacheManager.clearCache()
  }

  test("triage classifies both planted classes; fingerprint is the line's sha256") {
    val dir = JsonlIngest.ensureJsonlDrop(spark, TestSpark.Sf0001)
    val (_, quarantine) = JsonlIngest.readWithQuarantine(spark, dir)
    val rows = JsonlIngest.classifyQuarantine(quarantine)
      .as[(String, String, String)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (raw, fp, cls) =>
      val expected = if (raw.startsWith("{\"doc_id\":\"id-")) "schema_mismatch" else "truncated"
      assert(cls == expected, s"class of $raw")
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(raw.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(fp == hex, "fingerprint must be the sha256 hex of the raw bytes")
    }
    assert(rows.map(_._3).toSet == Set("schema_mismatch", "truncated"))
    spark.sharedState.cacheManager.clearCache()
  }

  test("invalid_utf8 classification takes precedence (U+FFFD marks upstream byte damage)") {
    // the staged fixture is Spark-written UTF-8 and can't carry invalid
    // bytes, so this arm is pinned on in-memory lines: a broken line with
    // the replacement char classifies as encoding damage, not truncation,
    // and a clean truncation stays `truncated`
    val q = Seq(
      "{\"doc_id\":1,\"text\":\"ab�cd",
      "{\"doc_id\":2,\"text\":\"ab").toDF("raw")
    val got = JsonlIngest.classifyQuarantine(q)
      .select("error_class").as[String].collect().toSeq
    assert(got == Seq("invalid_utf8", "truncated"))
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

  test("streaming triage equals the batch triage channel (oracle-independent)") {
    val batch = SparkEntry.queries("ingest_jsonl_triage")(spark, TestSpark.Sf0001)
      .as[(String, String, String)].collect().toSet
    val stream = SparkEntry.queries("stream_ingest_triage")(spark, TestSpark.Sf0001)
      .as[(String, String, String)].collect().toSet
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
