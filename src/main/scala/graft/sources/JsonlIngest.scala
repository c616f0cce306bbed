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
    * order, with every 97th document's line TRUNCATED to half length —
    * the planted corruption (a cut-off upload) the quarantine channel
    * must catch. A half-truncated compact JSON object can never be valid
    * (its only closing brace is the final character), so the planted set
    * is structurally corrupt under any parser. Fingerprinted + idempotent
    * like the other staged fixtures; corpus regeneration restages. */
  def ensureJsonlDrop(spark: SparkSession, sfDir: String): String = synchronized {
    val src = s"$sfDir/documents.parquet"
    val fp = Integer.toHexString(sfDir.hashCode) + "_" +
      graft.plans.MaterializedViews.filesFingerprint(Seq(src))
    val dir = new java.io.File(new java.io.File(
      sys.props("java.io.tmpdir"), "graft-jsonl"), s"documents_$fp")
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      Tables.load(spark, sfDir, "documents")
        .orderBy("doc_id")
        .withColumn("line", to_json(struct(col("doc_id"), col("text"), col("lang"))))
        .select(
          when(col("doc_id") % 97 === 0,
            expr("substring(line, 1, length(line) div 2)"))
            .otherwise(col("line")).as("value"))
        .coalesce(1)
        .write.mode("overwrite").text(dir.getPath)
    }
    dir.getPath
  }

  /** PERMISSIVE JSONL read with a quarantine channel. Returns
    * (valid rows in [[dropSchema]], quarantined raw lines as `raw`).
    * The parsed frame is persisted because Spark disallows filtering the
    * internal corrupt-record column straight off the streaming parser
    * (and the split consumes it twice); see the object doc for the
    * bronze-table production shape. */
  def readWithQuarantine(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) = {
    val withCorrupt = dropSchema.add(StructField("_corrupt_record", StringType))
    val parsed = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val valid = parsed.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantine = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"))
    (valid, quarantine)
  }

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
  )

  /** Both oracles reconstruct the staged lines in SQL — DuckDB's compact
    * `to_json` renders byte-identically to Spark's for this corpus (pure
    * ASCII, no escapes; pinned in IngestSpec), so no file path enters the
    * oracle. */
  private val linesCte: String =
    """WITH lines AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 97 = 0
      |              THEN substring(l, 1, length(l) // 2)
      |              ELSE l END AS line
      |  FROM (SELECT doc_id,
      |               CAST(to_json(struct_pack(doc_id := doc_id, text := text, lang := lang)) AS VARCHAR) AS l
      |        FROM documents) _
      |)""".stripMargin

  val oracle: Seq[(String, String)] = Seq(
    "ingest_jsonl" ->
      s"""$linesCte
         |SELECT CAST(json_extract(line, '$$.doc_id') AS BIGINT) AS doc_id,
         |       json_extract_string(line, '$$.lang') AS lang
         |FROM lines WHERE json_valid(line)
         |ORDER BY doc_id""".stripMargin,
    "ingest_jsonl_quarantine" ->
      s"""$linesCte
         |SELECT line AS raw FROM lines
         |WHERE NOT json_valid(line)
         |ORDER BY raw""".stripMargin,
  )
}
