package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** Federated WRITE path: `INSERT INTO <backend table>` rendered from the
  * written rows — the sink half of the JDBC-parity surface the reference's
  * stated model targets (`README.md:4`: "the same functionality that the
  * Spark DataSource for JDBC supports") but never built (it has no sinks,
  * SURVEY.md §2.A A10).
  *
  * Two strategies, selected per backend — see [[GraftBatchWrite]]: the
  * production path streams transactional INSERTs executor-side (commit
  * messages carry counts only, nothing scales with the dataset on the
  * driver); the in-process double funnels rendered tuples through the
  * driver at global commit (its backend shares the engine's scheduler;
  * see [[ViewBackendConnection]] for why task-side backend calls
  * deadlock there).
  */
object SqlWrite {
  import graft.plans.SqlGen.{Dialect, SparkSqlDialect}

  /** Rows per INSERT statement: bounds statement size (predictable parse
    * cost on the backend) while amortizing per-statement overhead. Shared
    * by both write strategies. */
  val InsertBatch = 500

  /** Types with a portable single-literal rendering (the same surface the
    * filter pushdown accepts, minus nothing: writes must not silently
    * drop data, so unsupported types are rejected at write-builder time
    * rather than per-row). */
  def writable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** String literal with dialect-correct escaping: quote-doubling is
    * universal; the Spark dialect additionally interprets backslash
    * escapes, so backslashes double there (the read-side pushdown instead
    * REJECTS backslash strings — a residual filter is free, a dropped row
    * is not). */
  def stringLit(s: String, d: Dialect): String = {
    val body = if (d == SparkSqlDialect) s.replace("\\", "\\\\") else s
    "'" + body.replace("'", "''") + "'"
  }

  /** ANSI `MERGE INTO` (SQL:2003) for key-matched upsert: every non-key
    * column of a matched row is replaced, unmatched rows insert — i.e.
    * full-row replace by key, the semantics real pipelines mean by
    * "upsert". A key-only schema degenerates to insert-if-absent (no
    * UPDATE clause at all — some engines reject an empty SET list).
    * CONTRACT: the source must be key-unique; the SQL standard (and both
    * Derby and Postgres) reject two source rows matching one target row. */
  def renderMerge(target: String, source: String, keys: Seq[String],
      cols: Seq[String], d: Dialect): String = {
    require(keys.nonEmpty, "MERGE needs at least one key column")
    val missing = keys.filterNot(cols.contains)
    require(missing.isEmpty,
      s"upsert keys [${missing.mkString(", ")}] are not in the written columns [${cols.mkString(", ")}]")
    val on = keys.map(k => s"t.${d.quote(k)} = s.${d.quote(k)}").mkString(" AND ")
    val nonKeys = cols.filterNot(keys.contains)
    val update =
      if (nonKeys.isEmpty) ""
      else " WHEN MATCHED THEN UPDATE SET " +
        nonKeys.map(c => s"${d.quote(c)} = s.${d.quote(c)}").mkString(", ")
    s"MERGE INTO ${d.quote(target)} t USING ${d.quote(source)} s ON $on" +
      update +
      s" WHEN NOT MATCHED THEN INSERT (${cols.map(d.quote).mkString(", ")})" +
      s" VALUES (${cols.map(c => s"s.${d.quote(c)}").mkString(", ")})"
  }

  /** Value → SQL literal for INSERT VALUES. Unlike the filter path this
    * must render EVERY value of a writable type, so non-finite floats get
    * the portable CAST form and backslash strings the dialect escape. */
  def valueLit(v: Any, d: Dialect): String = v match {
    case null => "NULL"
    case s: String => stringLit(s, d)
    case f: Float if f.isNaN => "CAST('NaN' AS FLOAT)"
    case f: Float if f.isInfinite =>
      s"CAST('${if (f > 0) "Infinity" else "-Infinity"}' AS FLOAT)"
    case x: Double if x.isNaN => "CAST('NaN' AS DOUBLE)"
    case x: Double if x.isInfinite =>
      s"CAST('${if (x > 0) "Infinity" else "-Infinity"}' AS DOUBLE)"
    case other => FilterSql.literal(other, d).getOrElse(
      throw new IllegalArgumentException(
        s"no SQL literal rendering for ${other.getClass.getName}: $other"))
  }
}

/** Sink observability: how many rows physically landed on the backend.
  *
  * Two views of the same count, for the two scales this runs at:
  *
  *  - [[RowsLandedMetric]] is a DSv2 custom metric ([[CustomSumMetric]])
  *    declared on the Write and reported per task via
  *    `DataWriter.currentMetricsValues` — on a real cluster Spark
  *    aggregates it into the write node's SQL metrics (visible in the UI
  *    and history server), the standard mechanism for sink telemetry.
  *  - [[SinkMetrics.landed]] is a process-global counter bumped at each
  *    task writer's COMMIT with its final row count. Single-JVM
  *    assumption, the same one [[graft.PlanAudit.measureShuffle]] states:
  *    in local mode every task shares this JVM, so the counter equals the
  *    cluster metric — it exists so the TEST SUITE can gate a per-row
  *    sink budget (PlanAudit.sinkBudgets) without scraping the status
  *    store. Commit-time bumping keeps the hot path free of per-row
  *    atomics and counts only rows whose task transaction committed
  *    (aborted tasks rolled their rows back). */
object SinkMetrics {
  val RowsLanded = "rowsLanded"
  val landed = new java.util.concurrent.atomic.AtomicLong(0L)
  private[sources] def committed(rows: Long): Unit = landed.addAndGet(rows)
}

class RowsLandedMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = SinkMetrics.RowsLanded
  override def description(): String = "rows landed on the SQL backend"
}

case class RowsLandedTaskMetric(value: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name(): String = SinkMetrics.RowsLanded
}

/** Rendered `(v1, v2, …)` tuples from one task, carried to global commit
  * (the driver-funnel path — in-process double only). */
case class RenderedTuples(tuples: Seq[String]) extends WriterCommitMessage

/** Executor-side path's commit message: the rows are already durable in
  * the task's committed backend transaction — only the count travels. */
case class WroteCount(rows: Long) extends WriterCommitMessage

class GraftWriteBuilder(table: String, backend: SqlBackend,
    schema: StructType, upsertKeys: Option[String] = None,
    queryId: String = "") extends WriteBuilder with SupportsTruncate {
  // reject unwritable columns at planning, not mid-job
  schema.fields.filterNot(f => SqlWrite.writable(f.dataType)) match {
    case bad if bad.nonEmpty =>
      throw new IllegalArgumentException(
        s"cannot write columns [${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}] " +
          s"to ${backend.name}.$table: no SQL literal rendering")
    case _ =>
  }
  private var truncateFirst = false
  /** Overwrite mode (the JDBC-sink `truncate` semantics): empty the table
    * before the new rows land. Non-atomic across the truncate/write pair —
    * a job that dies in between leaves the table empty, the same contract
    * as Spark's own JDBC sink in truncate mode. */
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def supportedCustomMetrics()
        : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
      Array(new RowsLandedMetric)
    override def toBatch: BatchWrite = upsertKeys match {
      case Some(ks) =>
        require(!truncateFirst,
          "truncate + upsertKeys is contradictory: an emptied table has no rows to match — use a plain overwrite")
        val keys = ks.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        new GraftMergeBatchWrite(table, backend, schema, keys, queryId)
      case None => new GraftBatchWrite(table, backend, schema, truncateFirst)
    }
  }
}

/** Two write strategies behind one BatchWrite, selected by
  * [[SqlBackend.supportsTaskSideWrites]]:
  *
  *  - **Executor-side streaming** (production JDBC): each task opens its
  *    own backend transaction ([[SqlConnection.beginWrite]]), streams
  *    batched INSERTs as rows arrive — bounded memory: at most
  *    `InsertBatch` rendered tuples are ever held — and commits the
  *    transaction in `DataWriter.commit`. Commit messages carry row COUNTS
  *    only, so nothing scales with the dataset on the driver. Atomicity is
  *    per-task (Spark's commit protocol: a failed/speculative task rolls
  *    back and retries); a job that dies between task commits can leave
  *    earlier tasks' rows durable — the same contract as Spark's own JDBC
  *    sink, and the honest one without a backend-side two-phase commit.
  *  - **Driver funnel** (in-process test double, whose backend shares the
  *    engine's scheduler — a task-side backend call deadlocks local mode):
  *    tasks render tuples into commit messages; global commit executes the
  *    INSERTs driver-side. Nothing durable before global commit, so task
  *    failures are invisible; a failure BETWEEN commit-time statements can
  *    still leave earlier batches durable (no transactions on the double).
  *    Driver memory scales with the written rows — dimension-scale only.
  */
class GraftBatchWrite(table: String, backend: SqlBackend,
    schema: StructType, truncateFirst: Boolean = false) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    // overwrite empties the table on the DRIVER, before any task launches
    // (the streaming path makes rows durable at task commit, so the
    // truncate must globally precede them; TRUNCATE TABLE parses on both
    // the Spark double and Derby, and unlike DELETE FROM it works on the
    // double's managed tables)
    if (truncateFirst)
      backend.executeUpdate(s"TRUNCATE TABLE ${backend.dialect.quote(table)}")
    GraftWriterFactory(table, schema, backend)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val d = backend.dialect
    val cols = schema.fieldNames.map(d.quote).mkString(", ")
    messages.iterator
      .flatMap { case RenderedTuples(ts) => ts; case _: WroteCount => Nil }
      .grouped(SqlWrite.InsertBatch)
      .foreach { batch =>
        backend.executeUpdate(
          s"INSERT INTO ${d.quote(table)} ($cols) VALUES ${batch.mkString(", ")}")
      }
  }

  /** Streaming path: every task that reached DataWriter.commit committed
    * its own transaction, and failed tasks already rolled back — nothing
    * to undo here. Funnel path: nothing durable happened yet. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Key-matched upsert ("MERGE"): rows land in a PER-JOB staging table
  * through the ordinary parallel task writers (INSERT streaming or binary
  * COPY — nothing new on the hot path), then one driver-side set operation
  * folds staging into the target at global commit:
  *
  *  - **MERGE path** (backends advertising [[SqlBackend.supportsMerge]]):
  *    ANSI `MERGE INTO target USING staging` inside ONE backend
  *    transaction — the target flips atomically, and the statement never
  *    moves rows through Spark. This is the stage-then-merge pattern real
  *    bulk pipelines use (COPY into staging, MERGE to publish).
  *  - **Emulated path** (the in-process double — Spark SQL has no MERGE
  *    for v1 tables): materialize `staging ∪ (target ⟕̸ staging)` into a
  *    scratch table, then `INSERT OVERWRITE` the target from it (reading
  *    the target while overwriting it is illegal in Spark, hence the
  *    materialization). Not atomic across the two statements — acceptable
  *    for the test double; production backends take the MERGE path.
  *
  * Scale shape: landing is the unchanged executor-parallel write path;
  * the publish is one backend-side relational operation whose cost lives
  * in the backend, not the driver. CONTRACT (the SQL standard's): the
  * written rows must be key-unique — two source rows matching one target
  * row is an error on every MERGE-bearing engine. */
class GraftMergeBatchWrite(table: String, backend: SqlBackend,
    schema: StructType, keys: Seq[String], queryId: String) extends BatchWrite {
  private val d = backend.dialect
  private val cols = schema.fieldNames.toSeq
  // validate at construction (driver, before any task): key/column drift
  // must not survive to a half-landed job
  SqlWrite.renderMerge(table, "staging_probe", keys, cols, d)
  // per-job staging name: concurrent upserts into one target get distinct
  // landing zones (queryId is Spark's per-write UUID)
  private val staging =
    table + "__up_" + queryId.filter(_.isLetterOrDigit).takeRight(8)

  private def dropIgnore(name: String): Unit =
    try backend.executeUpdate(s"DROP TABLE ${d.quote(name)}")
    catch { case _: Exception => }

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val colList = cols.map(d.quote).mkString(", ")
    if (!backend.supportsMerge) {
      // the emulated publish overwrites the WHOLE target, so a column
      // subset would silently drop the unwritten columns — refuse here,
      // before any task runs (the MERGE path handles subsets natively)
      val tgt = backend.schema(table).fieldNames.toSeq
      require(tgt == cols,
        s"emulated upsert rewrites the whole target: written columns [${cols.mkString(", ")}] " +
          s"must be exactly the target's [${tgt.mkString(", ")}]")
    }
    dropIgnore(staging)
    // clone the written columns' types from the target itself — no
    // Spark→backend DDL type map to drift, and a missing target column
    // fails here rather than mid-job
    backend.executeUpdate(
      if (d == graft.plans.SqlGen.SparkSqlDialect)
        s"CREATE TABLE ${d.quote(staging)} AS SELECT $colList FROM ${d.quote(table)} LIMIT 0"
      else
        s"CREATE TABLE ${d.quote(staging)} AS SELECT $colList FROM ${d.quote(table)} WITH NO DATA")
    GraftWriterFactory(staging, schema, backend)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val q = d.quote _
    val colList = cols.map(q).mkString(", ")
    // driver-funnel tuples (non-task-side backends) land into staging now;
    // task-side backends already committed their staging transactions
    messages.iterator
      .flatMap { case RenderedTuples(ts) => ts; case _: WroteCount => Nil }
      .grouped(SqlWrite.InsertBatch)
      .foreach { batch =>
        backend.executeUpdate(
          s"INSERT INTO ${q(staging)} ($colList) VALUES ${batch.mkString(", ")}")
      }
    try {
      if (backend.supportsMerge) {
        val txn = backend.connection.beginWrite()
        try {
          txn.executeUpdate(SqlWrite.renderMerge(table, staging, keys, cols, d))
          txn.commit()
        } catch { case t: Throwable =>
          try txn.rollback() catch { case s: Throwable => t.addSuppressed(s) }
          throw t
        }
      } else {
        val merged = staging + "_m"
        val keyEq = keys.map(k => s"s.${q(k)} = t.${q(k)}").mkString(" AND ")
        dropIgnore(merged)
        backend.executeUpdate(
          s"CREATE TABLE ${q(merged)} AS SELECT $colList FROM ${q(staging)} " +
            s"UNION ALL SELECT ${cols.map(c => s"t.${q(c)}").mkString(", ")} " +
            s"FROM ${q(table)} t WHERE NOT EXISTS " +
            s"(SELECT 1 FROM ${q(staging)} s WHERE $keyEq)")
        try backend.executeUpdate(
          s"INSERT OVERWRITE TABLE ${q(table)} SELECT $colList FROM ${q(merged)}")
        finally dropIgnore(merged)
      }
    } finally dropIgnore(staging)
  }

  /** Task transactions into staging rolled back or committed per Spark's
    * protocol; the target was never touched — dropping staging undoes the
    * whole job. */
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    dropIgnore(staging)
}

case class GraftWriterFactory(table: String, schema: StructType,
    backend: SqlBackend) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    if (backend.supportsTaskSideWrites) {
      // binary bulk-ingest fast path when the backend offers one (COPY
      // FROM STDIN on Postgres-family URLs); INSERT streaming otherwise.
      // The choice — and every backend touch behind it (connection,
      // metadata probe, COPY transaction) — is deferred to the first row:
      // empty partitions commit WroteCount(0) without a backend round trip.
      new LazyOpenWriter(() => {
        val conn = backend.connection
        conn.copyWrite(table, schema, backend.dialect)
          .map(new CopyStreamWriter(schema, _): DataWriter[InternalRow])
          .getOrElse(new StreamingSqlWriter(table, schema, backend.dialect, conn))
      })
    } else new GraftDataWriter(schema, backend.dialect)
}

/** Defers writer construction to the first row, so a task with an empty
  * partition never opens a backend connection or COPY transaction (the
  * eager form cost one empty COPY round trip per empty partition — at
  * 1000 executors with AQE-coalesced empty splits, a connection storm). */
class LazyOpenWriter(make: () => DataWriter[InternalRow])
    extends DataWriter[InternalRow] {
  private var inner: DataWriter[InternalRow] = _
  override def write(record: InternalRow): Unit = {
    if (inner == null) inner = make()
    inner.write(record)
  }
  override def commit(): WriterCommitMessage =
    if (inner == null) WroteCount(0L) else inner.commit()
  override def abort(): Unit = if (inner != null) inner.abort()
  override def close(): Unit = if (inner != null) inner.close()
  override def currentMetricsValues(): Array[
      org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    if (inner == null) Array(RowsLandedTaskMetric(0L))
    else inner.currentMetricsValues()
}

/** Binary-COPY writer: rows stream through [[PgCopyEncoder]] onto the
  * channel's wire stream — no literal rendering, no statement parsing on
  * the backend, one framed stream per task inside the channel's
  * transaction (per-task atomicity identical to [[StreamingSqlWriter]]). */
class CopyStreamWriter(schema: StructType, channel: CopyWriteChannel)
    extends DataWriter[InternalRow] {
  private val deserialize =
    ExpressionEncoder(RowEncoder.encoderFor(schema)).resolveAndBind()
      .createDeserializer()
  private val stream =
    new PgCopyEncoder.Stream(channel.out, schema, channel.uuidCols)
  private var written = 0L

  override def write(record: InternalRow): Unit = {
    stream.writeRow(deserialize(record))
    written += 1
  }
  override def commit(): WriterCommitMessage = {
    stream.finish()
    channel.commit()
    SinkMetrics.committed(written)
    WroteCount(written)
  }
  override def abort(): Unit = channel.rollback()
  override def close(): Unit = ()
  override def currentMetricsValues(): Array[
      org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(RowsLandedTaskMetric(written))
}

/** Driver-funnel writer: renders tuples, ships them in the commit message. */
class GraftDataWriter(schema: StructType,
    dialect: graft.plans.SqlGen.Dialect) extends DataWriter[InternalRow] {
  private val deserialize =
    ExpressionEncoder(RowEncoder.encoderFor(schema)).resolveAndBind()
      .createDeserializer()
  private val tuples = scala.collection.mutable.ArrayBuffer.empty[String]

  override def write(record: InternalRow): Unit = {
    val row = deserialize(record)
    tuples += Range(0, schema.length)
      .map(i => SqlWrite.valueLit(row.get(i), dialect))
      .mkString("(", ", ", ")")
  }
  override def commit(): WriterCommitMessage = {
    SinkMetrics.committed(tuples.size.toLong)
    RenderedTuples(tuples.toSeq)
  }
  override def abort(): Unit = tuples.clear()
  override def close(): Unit = ()
  override def currentMetricsValues(): Array[
      org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(RowsLandedTaskMetric(tuples.size.toLong))
}

/** Executor-side streaming writer: batched INSERTs through a task-side
  * backend transaction, opened lazily on the first row (an empty partition
  * never touches the backend). Memory high-water mark is one batch of
  * rendered tuples, independent of partition size. */
class StreamingSqlWriter(table: String, schema: StructType,
    dialect: graft.plans.SqlGen.Dialect, connection: SqlConnection)
    extends DataWriter[InternalRow] {
  private val deserialize =
    ExpressionEncoder(RowEncoder.encoderFor(schema)).resolveAndBind()
      .createDeserializer()
  private val cols = schema.fieldNames.map(dialect.quote).mkString(", ")
  private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
  private var txn: WriteTxn = _
  private var written = 0L

  private def flush(): Unit = if (buf.nonEmpty) {
    if (txn == null) txn = connection.beginWrite()
    txn.executeUpdate(
      s"INSERT INTO ${dialect.quote(table)} ($cols) VALUES ${buf.mkString(", ")}")
    written += buf.size
    buf.clear()
  }

  override def write(record: InternalRow): Unit = {
    val row = deserialize(record)
    buf += Range(0, schema.length)
      .map(i => SqlWrite.valueLit(row.get(i), dialect))
      .mkString("(", ", ", ")")
    if (buf.size >= SqlWrite.InsertBatch) flush()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    if (txn != null) txn.commit()
    SinkMetrics.committed(written)
    WroteCount(written)
  }

  override def abort(): Unit = {
    buf.clear()
    if (txn != null) txn.rollback()
  }

  override def close(): Unit = ()

  override def currentMetricsValues(): Array[
      org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(RowsLandedTaskMetric(written + buf.size))
}
