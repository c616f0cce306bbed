package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC/1.0) ingestion with a quarantine channel — the
  * arrival format of real web crawls (Common Crawl ships response records
  * exactly like these), one robustness tier below [[JsonlIngest]]: the
  * framing itself can be damaged (a cut-off upload truncates a payload
  * mid-record), so the parser must RESYNC on the record magic and
  * quarantine the damaged record without losing the records after it.
  *
  * Record shape parsed here (the response-record subset a text pipeline
  * consumes): WARC header block (`WARC/1.0` magic + headers, blank-line
  * terminated), a payload of exactly `Content-Length` bytes holding an
  * HTTP response (status line, headers, blank line, body = document
  * text), then the `\r\n\r\n` record separator.
  *
  * Scale shape: WARC files are NOT splittable mid-file (real archives
  * gzip per record; framing is not line-aligned), so the unit of
  * parallelism is the FILE — the crawl convention of ~1 GiB archives
  * means a 100 TB crawl is ~100k files, far above any executor count.
  * The read is `binaryFile` (one row per archive) and the parse is one
  * map-side pass per archive: no shuffle anywhere before the consumer's
  * own plan. Memory is bounded by one archive per task (the same bound
  * the per-record-gzip layout imposes on ANY reader). Framing contract:
  * the primary walk is Content-Length-driven (a WELL-FORMED payload may
  * contain anything, including the record magic); only when a record's
  * claimed length does not land on the `\r\n\r\n` separator does the
  * parser fall back to RESYNC — scan forward to the next `WARC/1.0\r\n`
  * magic, quarantine the damaged span, continue. A damaged record whose
  * own payload contains the magic resyncs into that payload and emits
  * garbage quarantine rows until the next true boundary — inherent to
  * magic-scan recovery; real crawls bound it with per-record gzip.
  */
object WarcIngest {

  private val Magic = "WARC/1.0\r\n"
  private val UriPrefix = "http://example.com/doc/"

  /** One parsed record: either a valid document row or a quarantined
    * record with the fault class (headers survive payload damage, so the
    * target URI is always recoverable). */
  private[graft] final case class WarcRow(
      docId: Option[Long], text: String, lang: String,
      targetUri: String, errorClass: String)

  /** Parse one archive's bytes into rows — executor-side, one pass.
    * ISO-8859-1 decode preserves bytes 1:1 so Content-Length validation
    * counts real bytes (the staged corpus is ASCII, where chars == bytes
    * under UTF-8 too). */
  private[graft] def parseArchive(bytes: Array[Byte]): Seq[WarcRow] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRow]
    var pos = s.indexOf(Magic) // leading garbage (a clipped tail) is skipped
    while (pos >= 0 && pos < s.length) {
      val headerEnd = s.indexOf("\r\n\r\n", pos)
      // a claimed length that is negative or cannot possibly fit this
      // archive is framing damage — range-check BEFORE narrowing so a
      // > 2^31 claim cannot wrap to a small positive and sneak a damaged
      // record past the separator check with a wrong payload boundary
      val claimed =
        if (headerEnd < 0) None
        else header(s.substring(pos, headerEnd), "Content-Length")
          .flatMap(_.toLongOption)
          .filter(n => n >= 0 && n <= s.length.toLong)
      val payloadAt = headerEnd + 4
      // Long arithmetic end-to-end: the narrowing happens only once the
      // separator position is proven in-bounds
      val sepAtL = claimed.map(payloadAt.toLong + _)
      val wellFramed = headerEnd >= 0 && claimed.isDefined &&
        sepAtL.get + 4 <= s.length &&
        s.startsWith("\r\n\r\n", sepAtL.get.toInt) &&
        (sepAtL.get + 4 == s.length || s.startsWith(Magic, sepAtL.get.toInt + 4))
      if (wellFramed) {
        val sepAt = sepAtL.get.toInt
        out += parseWellFramed(s.substring(pos, headerEnd),
          s.substring(payloadAt, sepAt))
        pos = sepAt + 4
      } else {
        // framing damage: quarantine this span, resync to the next magic
        val resync = s.indexOf(Magic, pos + Magic.length)
        val headers =
          if (headerEnd >= 0 && (resync < 0 || headerEnd < resync))
            s.substring(pos, headerEnd)
          else s.substring(pos, if (resync < 0) s.length else resync)
        out += WarcRow(None, "", "",
          header(headers, "WARC-Target-URI").getOrElse(""), "truncated")
        pos = resync
      }
    }
    out.toSeq
  }

  private def header(block: String, name: String): Option[String] =
    block.linesWithSeparators
      .map(_.stripLineEnd).find(_.toLowerCase.startsWith(name.toLowerCase + ":"))
      .map(_.substring(name.length + 1).trim)

  private def parseWellFramed(headers: String, payload: String): WarcRow = {
    val uri = header(headers, "WARC-Target-URI").getOrElse("")
    val bodyAt = payload.indexOf("\r\n\r\n")
    val httpHeaders = if (bodyAt >= 0) payload.substring(0, bodyAt) else payload
    val body = if (bodyAt >= 0) payload.substring(bodyAt + 4) else ""
    val lang = header(httpHeaders, "X-Doc-Lang").getOrElse("")
    val docId =
      if (uri.startsWith(UriPrefix)) uri.substring(UriPrefix.length).toLongOption
      else None
    docId match {
      case Some(id) => WarcRow(Some(id), body, lang, uri, "")
      case None => WarcRow(None, "", "", uri, "schema_mismatch")
    }
  }

  /** Render one response record (staging side — shared framing constants
    * with the parser so the fixture and the parser can't drift apart). */
  private def renderRecord(docId: String, text: String, lang: String,
      truncatePayload: Boolean): String = {
    val body = s"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n" +
      s"X-Doc-Lang: $lang\r\n\r\n$text"
    val kept = if (truncatePayload) body.substring(0, body.length / 2) else body
    Magic +
      s"WARC-Type: response\r\n" +
      s"WARC-Target-URI: $UriPrefix$docId\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n" + // claimed = UNtruncated length
      kept + "\r\n\r\n"
  }

  /** Stage a deterministic WARC "crawl archive" derived from the sf dir's
    * documents table, with the SAME two planted corruption classes as the
    * JSONL drop —
    *  - every 97th document's payload TRUNCATED to half length while the
    *    header still claims the full Content-Length (a cut-off upload:
    *    framing damage the parser must resync across), and
    *  - every 89th (not also 97th) document's target URI carrying the
    *    STRING id "id-<n>" (vendor drift: a well-framed record whose
    *    identity fails the imposed LongType).
    * Driver-streamed single archive (test scale; the corpus is iterated,
    * never materialized), fingerprinted + atomically published like every
    * staged fixture. */
  def ensureWarcDrop(spark: SparkSession, sfDir: String): String = {
    val dir = graft.ops.Dedup.fingerprintedDir("graft-warc", "documents",
      sfDir + "v1", Seq(s"$sfDir/documents.parquet"))
    graft.ops.Dedup.stageAtomically(dir) { tmp =>
      tmp.mkdirs()
      val out = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(new java.io.File(tmp, "crawl.warc")))
      try {
        val it = Tables.load(spark, sfDir, "documents")
          .select("doc_id", "text", "lang").orderBy("doc_id").toLocalIterator()
        while (it.hasNext) {
          val r = it.next()
          val id = r.getLong(0)
          val idStr = if (id % 97 != 0 && id % 89 == 0) s"id-$id" else id.toString
          out.write(renderRecord(idStr, r.getString(1), r.getString(2),
            truncatePayload = id % 97 == 0)
            .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        }
      } finally out.close()
    }
  }

  /** Parse every archive under `path`: (valid docs, quarantined records).
    * `binaryFile` read + one flatMap per archive — parallel across
    * archives, zero shuffles. */
  def readWithQuarantine(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) =
    parseChannels(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc").load(path))

  /** The channel split over ANY DataFrame bearing archive bytes in a
    * `content` column — shared by the batch read above and the streaming
    * crawl twin's micro-batches, so the two arrival paths cannot drift
    * on framing or triage rules. */
  def parseChannels(archives: DataFrame): (DataFrame, DataFrame) = {
    val spark = archives.sparkSession
    import spark.implicits._
    val rows = archives
      .select("content").as[Array[Byte]]
      .flatMap(parseArchive _)
    val valid = rows.filter(_.errorClass.isEmpty)
      .map(r => (r.docId.get, r.text, r.lang, r.targetUri))
      .toDF("doc_id", "text", "lang", "target_uri")
    val quarantine = rows.filter(_.errorClass.nonEmpty)
      .map(r => (r.targetUri, r.errorClass))
      .toDF("target_uri", "error_class")
    (valid, quarantine)
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // the valid channel: full text round-trips the HTTP payload, so the
    // oracle hash-checks the body extraction, not just the framing
    "ingest_warc" -> ((s, d) => {
      val (valid, _) = readWithQuarantine(s, ensureWarcDrop(s, d))
      valid.orderBy("doc_id")
    }),
    // the triage channel: per damaged record, the recovered URI and the
    // fault class — truncation must NOT consume the records after it
    // (resync), which the oracle checks by exact row set
    "ingest_warc_triage" -> ((s, d) => {
      val (_, quarantine) = readWithQuarantine(s, ensureWarcDrop(s, d))
      quarantine.orderBy("target_uri")
    }),
  )

  /** The planting rule is pure SQL over documents, so both oracles
    * reconstruct the expected channels without touching the file. */
  val oracle: Seq[(String, String)] = Seq(
    "ingest_warc" ->
      s"""SELECT doc_id, text, lang,
         |       '$UriPrefix' || CAST(doc_id AS VARCHAR) AS target_uri
         |FROM documents
         |WHERE doc_id % 97 != 0 AND doc_id % 89 != 0
         |ORDER BY doc_id""".stripMargin,
    "ingest_warc_triage" ->
      s"""SELECT '$UriPrefix' ||
         |       CASE WHEN doc_id % 97 != 0 AND doc_id % 89 = 0
         |            THEN 'id-' || CAST(doc_id AS VARCHAR)
         |            ELSE CAST(doc_id AS VARCHAR) END AS target_uri,
         |       CASE WHEN doc_id % 97 = 0 THEN 'truncated'
         |            ELSE 'schema_mismatch' END AS error_class
         |FROM documents
         |WHERE doc_id % 97 = 0 OR doc_id % 89 = 0
         |ORDER BY target_uri""".stripMargin,
  )
}
