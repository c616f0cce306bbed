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

  // ---- CSV drop (r15) ------------------------------------------------

  test("CSV quarantine catches exactly the planted corruptions; quoting round-trips") {
    import graft.sources.CsvIngest
    val dir = CsvIngest.ensureCsvDrop(spark, TestSpark.Sf0001)
    val (valid, quarantine) = CsvIngest.readWithQuarantine(spark, dir)
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val truncated = docs.filter(col("doc_id") % 97 === 0)
      .select("doc_id").as[Long].collect().toSet
    val mangled = docs.filter(col("doc_id") % 89 === 0 && col("doc_id") % 97 =!= 0)
      .select("doc_id").as[Long].collect().toSet
    assert(truncated.nonEmpty && mangled.nonEmpty)
    val validRows = valid.select("doc_id", "text").as[(Long, String)].collect()
    val allIds = docs.select("doc_id").as[Long].collect().toSet
    assert(validRows.map(_._1).toSet == allIds -- truncated -- mangled)
    // univocity must hand back EXACTLY the sanitized planted text: quote
    // stripping, ""-unescaping, and the newline sanitization all fire on
    // the %7 plant rows
    val expected = docs
      .withColumn("planted",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(CsvIngest.PlantSnippet)))
          .otherwise(col("text")))
      .select(col("doc_id"), translate(col("planted"), "\r\n", "  ").as("t"))
      .as[(Long, String)].collect().toMap
    validRows.foreach { case (id, t) =>
      assert(t == expected(id), s"doc $id: parsed text != rendered text")
    }
    val plantSeen = validRows.filter(r => r._1 % 7 == 0 && r._1 % 97 != 0 && r._1 % 89 != 0)
    assert(plantSeen.nonEmpty, "no planted quote/comma rows reached the valid channel")
    plantSeen.foreach { case (id, t) =>
      assert(t.contains("\"well,") && !t.contains("\n"),
        s"doc $id: plant must keep the quote+comma and lose the newline")
    }
    // conservation
    assert(validRows.length + quarantine.count() == allIds.size)
    spark.sharedState.cacheManager.clearCache()
  }

  test("CSV triage: truncated vs schema_mismatch from the grammar; sha256 fingerprints") {
    import graft.sources.CsvIngest
    val dir = CsvIngest.ensureCsvDrop(spark, TestSpark.Sf0001)
    val (_, quarantine) = CsvIngest.readWithQuarantine(spark, dir)
    val rows = CsvIngest.classifyQuarantine(quarantine)
      .as[(String, String, String)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (raw, fp, cls) =>
      val expected = if (raw.startsWith("id-")) "schema_mismatch" else "truncated"
      assert(cls == expected, s"class of $raw")
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(raw.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(fp == hex)
    }
    assert(rows.map(_._3).toSet == Set("schema_mismatch", "truncated"))
    // U+FFFD precedence, same contract as the JSONL classifier
    val q = Seq("1,\"ab�", "2,\"ab").toDF("raw")
    assert(CsvIngest.classifyQuarantine(q)
      .select("error_class").as[String].collect().toSeq
      == Seq("invalid_utf8", "truncated"))
    spark.sharedState.cacheManager.clearCache()
  }

  test("univocity pins: unterminated quote runs to EOL (2 tokens), drift casts fail") {
    import graft.sources.CsvIngest
    // the oracle's grammar-based validity relies on these two univocity
    // behaviors — pin them on in-memory lines so a Spark upgrade that
    // changes either fails HERE, not at the gate
    val lines = Seq(
      "5,\"abc def",          // unterminated quote: 2 tokens → quarantined
      "6,\"ab,cd",            // comma inside the unclosed quote stays literal
      "id-7,\"x\",en",        // grammar-valid, doc_id cast fails → quarantined
      "8,\"ok, \"\"q\"\"\",en") // intact: quoted comma + doubled quote
    val ds = spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING)
    // the SHARED parse contract — the same schema+options object the
    // batch reader and streaming twins use, so this pin tests what ships
    val parsed = spark.read.schema(CsvIngest.corruptSchema)
      .options(CsvIngest.readOptions)
      .csv(ds)
      .collect()
    val byFirst = parsed.map(r => lines.find(l => r.getString(3) == l || (r
      .isNullAt(3) && !r.isNullAt(0) && l.startsWith(r.getLong(0).toString + ","))).get -> r).toMap
    assert(!byFirst(lines(0)).isNullAt(3), "unterminated quote must quarantine")
    assert(!byFirst(lines(1)).isNullAt(3), "unterminated quote with comma must quarantine")
    assert(!byFirst(lines(2)).isNullAt(3), "doc_id drift must quarantine")
    val ok = byFirst(lines(3))
    assert(ok.isNullAt(3) && ok.getLong(0) == 8L && ok.getString(1) == "ok, \"q\""
      && ok.getString(2) == "en")
  }

  test("streaming CSV ingest equals the batch channels (oracle-independent)") {
    val batch = SparkEntry.queries("ingest_csv")(spark, TestSpark.Sf0001)
      .as[(Long, String, String)].collect().toSet
    val stream = SparkEntry.queries("stream_ingest_csv")(spark, TestSpark.Sf0001)
      .as[(Long, String, String)].collect().toSet
    assert(stream == batch && batch.nonEmpty)
    val batchT = SparkEntry.queries("ingest_csv_triage")(spark, TestSpark.Sf0001)
      .as[(String, String, String)].collect().toSet
    val streamT = SparkEntry.queries("stream_ingest_csv_triage")(spark, TestSpark.Sf0001)
      .as[(String, String, String)].collect().toSet
    assert(streamT == batchT && batchT.nonEmpty)
    spark.sharedState.cacheManager.clearCache()
  }
}
