package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL ingestion with a quarantine channel — the arrival format of most
  * crawl/vendor document drops, and the robustness tier the pipeline needs
  * in front of [[graft.ops.Curation]]: a drop is never trusted to be
  * well-formed, rows that fail to parse are captured WHOLE for triage
  * (never silently dropped — the valid/quarantined counts are the
  * ingestion health signal), and the schema is imposed explicitly (a drop
  * never dictates its own types; silent schema drift is the round-9
  * failure class in file form).
  *
  * Scale shape: Spark's JSON source is a streaming per-partition parser —
  * the PERMISSIVE read is one map-side pass with no shuffle; the split
  * into valid/quarantine reads the parsed result twice, so it is
  * persisted here (test scale) — a production deployment lands the parsed
  * result as a bronze table first (one pass, then both channels read
  * columnar) instead of caching.
  */
object JsonlIngest {

  /** The imposed schema of a document drop line. */
  val dropSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Stage a deterministic JSONL "crawl drop" derived from the sf dir's
    * documents table: one compact `to_json` line per document in doc_id
    * order, with two planted corruption classes —
    *  - every 97th document's line TRUNCATED to half length (a cut-off
    *    upload; a half-truncated compact JSON object can never be valid,
    *    its only closing brace is the final character), and
    *  - every 89th (not also 97th) document's `doc_id` rendered as the
    *    STRING "id-<n>" (a vendor schema drift: valid JSON that fails
    *    the imposed LongType — PERMISSIVE quarantines the record).
    * Fingerprinted + idempotent like the other staged fixtures (published
    * via atomic rename so cross-JVM readers never see a partial drop);
    * corpus regeneration restages. */
  def ensureJsonlDrop(spark: SparkSession, sfDir: String): String = {
    val dir = graft.ops.Dedup.fingerprintedDir("graft-jsonl", "documents",
      sfDir + "v2", Seq(s"$sfDir/documents.parquet"))
    graft.ops.Dedup.stageAtomically(dir) { tmp =>
      Tables.load(spark, sfDir, "documents")
        .orderBy("doc_id")
        .withColumn("line", to_json(struct(col("doc_id"), col("text"), col("lang"))))
        .withColumn("mangled", to_json(struct(
          concat(lit("id-"), col("doc_id")).as("doc_id"), col("text"), col("lang"))))
        .select(
          when(col("doc_id") % 97 === 0,
            expr("substring(line, 1, length(line) div 2)"))
            .when(col("doc_id") % 89 === 0, col("mangled"))
            .otherwise(col("line")).as("value"))
        .coalesce(1)
        .write.mode("overwrite").text(tmp.getPath)
    }
  }

  /** The parse contract — schema-with-corrupt-channel and reader options
    * — as ONE definition shared by the batch reader and the streaming
    * twin (the [[graft.sources.CsvIngest]] convention, r15: an option
    * change applied to one arrival mode but not the other would silently
    * split contracts that share an oracle). */
  private[graft] val corruptSchema: StructType =
    dropSchema.add(StructField("_corrupt_record", StringType))
  private[graft] val readOptions: Map[String, String] = Map(
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> "_corrupt_record")

  /** PERMISSIVE JSONL read with a quarantine channel. Returns
    * (valid rows in [[dropSchema]], quarantined raw lines as `raw`).
    * The parsed frame is persisted because Spark disallows filtering the
    * internal corrupt-record column straight off the streaming parser
    * (and the split consumes it twice); see the object doc for the
    * bronze-table production shape. */
  def readWithQuarantine(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) = {
    val parsed = spark.read
      .schema(corruptSchema)
      .options(readOptions)
      .json(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val valid = parsed.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantine = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"))
    (valid, quarantine)
  }

  /** Triage enrichment over the quarantine channel (round-11 verdict
    * task 6): production triage needs to route a quarantined line by WHY
    * it failed and to recognize a re-dropped line it already saw. One
    * map-side pass adds
    *  - `fingerprint`: sha256 of the raw bytes — the stable re-drop
    *    matching key (sha256, not xxhash64, so the DuckDB oracle can
    *    recompute it bit-exactly), and
    *  - `error_class`:
    *      `invalid_utf8`     — the line carries U+FFFD, the replacement
    *                           character the UTF-8 reader substitutes for
    *                           undecodable bytes upstream;
    *      `schema_mismatch`  — structurally valid JSON that failed the
    *                           imposed schema (checked with
    *                           `get_json_object(raw, '$')`, which is NULL
    *                           exactly on malformed JSON);
    *      `truncated`        — everything else: structurally broken JSON
    *                           (cut-off upload, framing damage).
    * Precedence is top-down: a truncated line containing U+FFFD reports
    * the encoding damage (the earlier, more actionable fault). */
  def classifyQuarantine(quarantine: DataFrame): DataFrame =
    quarantine.select(
      col("raw"),
      sha2(col("raw"), 256).as("fingerprint"),
      when(col("raw").contains("\uFFFD"), "invalid_utf8")
        .when(get_json_object(col("raw"), "$").isNotNull, "schema_mismatch")
        .otherwise("truncated").as("error_class"))

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // the valid channel: parsed rows under the imposed schema
    "ingest_jsonl" -> ((s, d) => {
      val (valid, _) = readWithQuarantine(s, ensureJsonlDrop(s, d))
      valid.select("doc_id", "lang").orderBy("doc_id")
    }),
    // the quarantine channel: corrupt lines preserved BYTE-EXACTLY for
    // triage (the oracle reconstructs the same truncated bytes in SQL,
    // so any payload mangling in the quarantine path hash-mismatches)
    "ingest_jsonl_quarantine" -> ((s, d) => {
      val (_, quarantine) = readWithQuarantine(s, ensureJsonlDrop(s, d))
      quarantine.orderBy("raw")
    }),
    // triage: the quarantine channel with error class + re-drop
    // fingerprint; both planted classes must classify correctly and the
    // fingerprint must match the oracle's independent sha256
    "ingest_jsonl_triage" -> ((s, d) => {
      val (_, quarantine) = readWithQuarantine(s, ensureJsonlDrop(s, d))
      classifyQuarantine(quarantine).orderBy("raw")
    }),
  )

  /** Both oracles reconstruct the staged lines in SQL — DuckDB's compact
    * `to_json` renders byte-identically to Spark's for this corpus (pure
    * ASCII, no escapes; pinned in IngestSpec), so no file path enters the
    * oracle. */
  private[graft] val linesCte: String =
    """WITH lines AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 97 = 0
      |              THEN substring(l, 1, length(l) // 2)
      |              WHEN doc_id % 89 = 0 THEN lm
      |              ELSE l END AS line
      |  FROM (SELECT doc_id,
      |               CAST(to_json(struct_pack(doc_id := doc_id, text := text, lang := lang)) AS VARCHAR) AS l,
      |               CAST(to_json(struct_pack(doc_id := 'id-' || doc_id, text := text, lang := lang)) AS VARCHAR) AS lm
      |        FROM documents) _
      |)""".stripMargin

  /** A line parses under the imposed schema iff it is valid JSON AND its
    * doc_id is integral — the oracle-side mirror of Spark's PERMISSIVE
    * record-level contract (any field-conversion failure quarantines the
    * whole record; IngestSpec pins that behavior on the string-doc_id
    * planting). */
  private[graft] val parseable =
    // the CASE gate matters: DuckDB's json_extract THROWS on malformed
    // JSON and AND does not guarantee short-circuit evaluation, so the
    // extract must only ever see valid lines (NULL otherwise)
    "json_valid(line) AND TRY_CAST(json_extract(CASE WHEN json_valid(line) THEN line END, '$.doc_id') AS BIGINT) IS NOT NULL"

  val oracle: Seq[(String, String)] = Seq(
    "ingest_jsonl" ->
      s"""$linesCte
         |SELECT CAST(json_extract(line, '$$.doc_id') AS BIGINT) AS doc_id,
         |       json_extract_string(line, '$$.lang') AS lang
         |FROM lines WHERE $parseable
         |ORDER BY doc_id""".stripMargin,
    "ingest_jsonl_quarantine" ->
      s"""$linesCte
         |SELECT line AS raw FROM lines
         |WHERE NOT ($parseable)
         |ORDER BY raw""".stripMargin,
    // the fixture plants no undecodable bytes (the staged file is Spark-
    // written UTF-8), so invalid_utf8 never fires here — its classifier
    // arm is pinned by IngestSpec on an in-memory U+FFFD line instead
    "ingest_jsonl_triage" ->
      s"""$linesCte
         |SELECT line AS raw,
         |       sha256(line) AS fingerprint,
         |       CASE WHEN json_valid(line) THEN 'schema_mismatch'
         |            ELSE 'truncated' END AS error_class
         |FROM lines WHERE NOT ($parseable)
         |ORDER BY raw""".stripMargin,
  )
}
