package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** CSV ingestion with a quarantine channel — the OTHER arrival format of
  * vendor document drops (r15; completes the drop-format family beside
  * [[JsonlIngest]] and the three WARC layouts). Same contract as the
  * JSONL tier: the drop is never trusted, rows that fail the imposed
  * schema are captured WHOLE for triage, and the parse runs through
  * Spark's production CSV reader (univocity) in PERMISSIVE mode — this
  * module pins THAT parser against an oracle that re-derives validity and
  * field values from the line grammar alone.
  *
  * Rendering contract of the staged drop (every rule mirrored by the
  * oracle's `lines` CTE):
  *  - one record per line: `doc_id,"text",lang` — the text field is
  *    ALWAYS quoted (RFC 4180), embedded quotes doubled (`""` — escape
  *    char IS the quote char on the read side, so backslash stays a
  *    literal);
  *  - newlines are sanitized to spaces BEFORE rendering: a vendor CSV
  *    drop is single-line records ON PURPOSE — a newline-in-quotes CSV
  *    cannot be split at line boundaries, so a 100 TB read would lose
  *    per-file parallelism (Spark's multiLine mode is one task per file);
  *  - every 7th document's text gains a comma+quote+newline snippet so
  *    the quoting machinery actually fires on this clean-ASCII corpus
  *    (the planted-shape pattern of the BPE/langid fixtures);
  *  - every 97th line TRUNCATED to half length (cut-off upload — lands
  *    inside the quoted text field, leaving an unterminated quote), and
  *  - every 89th (not also 97th) line's `doc_id` rendered as the string
  *    `id-<n>` (vendor schema drift: grammatically valid CSV that fails
  *    the imposed LongType).
  *
  * Scale shape: identical to the JSONL tier — the PERMISSIVE read is one
  * map-side pass (per-line splits, no multiLine), the valid/quarantine
  * split persists at test scale where production lands a bronze table.
  */
object CsvIngest {

  /** The imposed schema of a document drop row. */
  val dropSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** The comma+quote+newline plant (mirrored glyph-for-glyph in the
    * oracle CTE): forces quoting, quote-doubling, and the newline
    * sanitization to fire on real rows. */
  private[graft] val PlantSnippet = " then said, \"well,\ndone\" twice"

  /** The line grammar of the rendering above — used by BOTH engines to
    * decide validity and extract fields (Java regex on the Spark side,
    * RE2 in DuckDB; the pattern stays in the common subset): three
    * comma-separated fields where field 2 is a doubled-quote-escaped
    * quoted string or a plain comma/quote-free token, fields 1 and 3 are
    * plain tokens. */
  private[graft] val LineRe = "^([^,\"]*),(\"(?:[^\"]|\"\")*\"|[^,\"]*),([^,\"]*)$"

  /** Stage the deterministic CSV "vendor drop" (fingerprinted +
    * idempotent + atomically published, like every staged fixture). */
  def ensureCsvDrop(spark: SparkSession, sfDir: String): String = {
    val dir = graft.ops.Dedup.fingerprintedDir("graft-csv", "documents",
      sfDir + "v1", Seq(s"$sfDir/documents.parquet"))
    graft.ops.Dedup.stageAtomically(dir) { tmp =>
      Tables.load(spark, sfDir, "documents")
        .orderBy("doc_id")
        // plant, then sanitize (the plant's newline is exactly what the
        // sanitize step must catch), then quote
        .withColumn("planted",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(PlantSnippet)))
            .otherwise(col("text")))
        .withColumn("san", translate(col("planted"), "\r\n", "  "))
        .withColumn("q",
          when(col("san").isNull, lit(""))
            .otherwise(concat(lit("\""),
              regexp_replace(col("san"), "\"", "\"\""), lit("\""))))
        .withColumn("line",
          concat(col("doc_id"), lit(","), col("q"), lit(","),
            coalesce(col("lang"), lit(""))))
        .withColumn("mangled",
          concat(lit("id-"), col("doc_id"), lit(","), col("q"), lit(","),
            coalesce(col("lang"), lit(""))))
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
    * — as ONE definition shared by the batch reader, the streaming twins
    * ([[graft.streaming.EventStreams]]), and the univocity behavior pins
    * in IngestSpec: an option change applied to one arrival mode but not
    * the other would silently split contracts that share an oracle
    * (r15 review). */
  private[graft] val corruptSchema: StructType =
    dropSchema.add(StructField("_corrupt_record", StringType))
  private[graft] val readOptions: Map[String, String] = Map(
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> "_corrupt_record",
    // escape = quote char: RFC 4180 doubled quotes, backslash literal
    "escape" -> "\"")

  /** PERMISSIVE CSV read with a quarantine channel — Spark's univocity
    * parser under the imposed schema: a token-count mismatch (the
    * truncated lines parse to 2 tokens — an unterminated quote runs to
    * end of line) or any field-conversion failure (the `id-<n>` drift)
    * quarantines the WHOLE raw line. Same persist caveat as the JSONL
    * tier (the corrupt-record column cannot be filtered straight off the
    * parser). Cache lifecycle = the Dedup.scala header convention: both
    * returned frames consume the cache lazily, so this op cannot
    * unpersist it; per-query callers clearCache() between entries. */
  def readWithQuarantine(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) = {
    val parsed = spark.read
      .schema(corruptSchema)
      .options(readOptions)
      .csv(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val valid = parsed.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantine = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"))
    (valid, quarantine)
  }

  /** Triage over the quarantine channel — the JSONL classifier's CSV
    * sibling, classes decided from the raw line alone:
    *  - `invalid_utf8`: U+FFFD present (encoding damage upstream);
    *  - `schema_mismatch`: the line MATCHES the grammar, so the only
    *    remaining failure is a field conversion (the doc_id drift);
    *  - `truncated`: the grammar itself is broken (cut-off upload).
    * Plus the sha256 re-drop fingerprint. */
  def classifyQuarantine(quarantine: DataFrame): DataFrame =
    quarantine.select(
      col("raw"),
      sha2(col("raw"), 256).as("fingerprint"),
      when(col("raw").contains("�"), "invalid_utf8")
        .when(col("raw").rlike(LineRe), "schema_mismatch")
        .otherwise("truncated").as("error_class"))

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // the valid channel under the imposed schema — text included: the
    // compare pins univocity's quote-stripping and ""-unescaping against
    // the oracle's grammar-extracted fields
    "ingest_csv" -> ((s, d) => {
      val (valid, _) = readWithQuarantine(s, ensureCsvDrop(s, d))
      valid.select("doc_id", "text", "lang").orderBy("doc_id")
    }),
    // quarantine + triage in one artifact (raw lines byte-exact, class,
    // re-drop fingerprint)
    "ingest_csv_triage" -> ((s, d) => {
      val (_, quarantine) = readWithQuarantine(s, ensureCsvDrop(s, d))
      classifyQuarantine(quarantine).orderBy("raw")
    }),
  )

  /** The oracle reconstructs the staged lines in SQL (clean-ASCII corpus
    * plus the mirrored plant — rendering is plain concatenation on both
    * engines), then decides validity and extracts fields from the LINE
    * GRAMMAR alone, never from plant knowledge: a truncated line that
    * happened to parse would land in the valid channel on both sides. */
  private[graft] val linesCte: String =
    s"""WITH lines AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 97 = 0
       |              THEN substring(l, 1, length(l) // 2)
       |              WHEN doc_id % 89 = 0 THEN lm
       |              ELSE l END AS line
       |  FROM (SELECT doc_id,
       |               doc_id || ',' || q || ',' || COALESCE(lang, '') AS l,
       |               'id-' || doc_id || ',' || q || ',' || COALESCE(lang, '') AS lm
       |        FROM (SELECT doc_id, lang,
       |                     CASE WHEN san IS NULL THEN ''
       |                          ELSE '"' || replace(san, '"', '""') || '"' END AS q
       |              FROM (SELECT doc_id, lang,
       |                           replace(replace(
       |                             CASE WHEN doc_id % 7 = 0
       |                                  THEN text || ' then said, "well,' || chr(10) || 'done" twice'
       |                                  ELSE text END,
       |                             chr(13), ' '), chr(10), ' ') AS san
       |                    FROM documents) _) _) _
       |)""".stripMargin

  /** [[LineRe]] as spliced into the oracle SQL — contains no single
    * quotes, so it embeds in a SQL string literal verbatim. */
  private val Re = LineRe

  /** A line is valid iff it matches the grammar AND its doc_id field is
    * integral — the grammar mirror of univocity's token-count check plus
    * PERMISSIVE's record-level conversion contract. */
  private[graft] val parseable =
    s"regexp_matches(line, '$Re') AND " +
      s"TRY_CAST(regexp_extract(line, '$Re', 1) AS BIGINT) IS NOT NULL"

  val oracle: Seq[(String, String)] = Seq(
    // field extraction from the grammar: unquote + unescape field 2,
    // empty unquoted fields read back as NULL (Spark's nullValue = "")
    "ingest_csv" ->
      s"""$linesCte
         |SELECT CAST(regexp_extract(line, '$Re', 1) AS BIGINT) AS doc_id,
         |       CASE WHEN f2 LIKE '"%'
         |            THEN replace(substring(f2, 2, length(f2) - 2), '""', '"')
         |            ELSE NULLIF(f2, '') END AS text,
         |       NULLIF(regexp_extract(line, '$Re', 3), '') AS lang
         |FROM (SELECT line, regexp_extract(line, '$Re', 2) AS f2 FROM lines) _
         |WHERE $parseable
         |ORDER BY doc_id""".stripMargin,
    // the staged file is Spark-written UTF-8, so invalid_utf8 never fires
    // here — its arm is pinned by IngestSpec on an in-memory U+FFFD line
    "ingest_csv_triage" ->
      s"""$linesCte
         |SELECT line AS raw,
         |       sha256(line) AS fingerprint,
         |       CASE WHEN regexp_matches(line, '$Re') THEN 'schema_mismatch'
         |            ELSE 'truncated' END AS error_class
         |FROM lines WHERE NOT ($parseable)
         |ORDER BY raw""".stripMargin,
  )
}
