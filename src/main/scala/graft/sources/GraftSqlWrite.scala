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
  * Shape: each task's [[GraftDataWriter]] renders its rows to SQL tuples
  * (distributing the literal-rendering cost) and ships them in its commit
  * message; [[GraftBatchWrite.commit]] then executes batched multi-row
  * INSERT statements on the DRIVER, after every task has succeeded. That
  * order gives all-or-nothing semantics per Spark's commit protocol
  * without requiring backend transactions: a failed/speculative task's
  * rows never reach the backend because nothing is inserted until global
  * commit. The cost is that written rows funnel through the driver — the
  * right trade for the in-process double (whose backend shares the
  * engine's scheduler; see [[ViewBackendConnection]] for why task-side
  * backend calls deadlock) and for dimension-scale writes. A production
  * JDBC sink would instead stream INSERTs executor-side inside `write`
  * within a per-task transaction, leaving the commit message empty — the
  * interface supports both without change.
  */
object SqlWrite {
  import graft.plans.SqlGen.{Dialect, SparkSqlDialect}

  /** Types with a portable single-literal rendering (the same surface the
    * filter pushdown accepts, minus nothing: writes must not silently
    * drop data, so unsupported types are rejected at write-builder time
    * rather than per-row). */
  def writable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | DateType | TimestampType => true
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
    case other => FilterSql.literal(other).getOrElse(
      throw new IllegalArgumentException(
        s"no SQL literal rendering for ${other.getClass.getName}: $other"))
  }
}

/** Rendered `(v1, v2, …)` tuples from one task, carried to global commit. */
case class RenderedTuples(tuples: Seq[String]) extends WriterCommitMessage

class GraftWriteBuilder(table: String, backend: SqlBackend,
    schema: StructType) extends WriteBuilder {
  // reject unwritable columns at planning, not mid-job
  schema.fields.filterNot(f => SqlWrite.writable(f.dataType)) match {
    case bad if bad.nonEmpty =>
      throw new IllegalArgumentException(
        s"cannot write columns [${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}] " +
          s"to ${backend.name}.$table: no SQL literal rendering")
    case _ =>
  }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftBatchWrite(table, backend, schema)
  }
}

class GraftBatchWrite(table: String, backend: SqlBackend,
    schema: StructType) extends BatchWrite {
  /** Rows per INSERT statement: bounds statement size (predictable parse
    * cost on the backend) while amortizing per-statement overhead. */
  private val InsertBatch = 500

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    GraftWriterFactory(schema, backend.dialect)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val d = backend.dialect
    val cols = schema.fieldNames.map(d.quote).mkString(", ")
    messages.iterator
      .flatMap { case RenderedTuples(ts) => ts }
      .grouped(InsertBatch)
      .foreach { batch =>
        backend.executeUpdate(
          s"INSERT INTO ${d.quote(table)} ($cols) VALUES ${batch.mkString(", ")}")
      }
  }

  /** Nothing durable happened yet (inserts only run at commit), so abort
    * has nothing to roll back. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class GraftWriterFactory(schema: StructType,
    dialect: graft.plans.SqlGen.Dialect) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(schema, dialect)
}

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
  override def commit(): WriterCommitMessage = RenderedTuples(tuples.toSeq)
  override def abort(): Unit = tuples.clear()
  override def close(): Unit = ()
}
