package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

import graft.plans.SqlGen.Dialect

/** Native Postgres-wire backend: the [[SqlBackend]] that talks v3
  * protocol directly through [[PgWire]] — no JDBC driver. This is the
  * architecture of the reference engine itself, which spawns its own
  * Postgres connections (`/root/reference/src/sqldb/postgres/mod.rs:133-168`)
  * and reads the catalog with hand-written information_schema SQL
  * (`mod.rs:67-125`); the JDBC backend is the driver-portable
  * alternative, this one is the Postgres-exact path and the one a
  * no-extra-jars deployment uses.
  *
  * Read-only by design: the write tier (INSERT streaming, binary COPY,
  * MERGE) lives on the JDBC backend where transactions are managed; a
  * wire-native write path would re-implement that machinery for no
  * pushdown gain. Everything the READ surface negotiates — scan-level
  * pushdown, partitioned parallel fetch, whole-plan fusion including
  * partitioned windows (`supportsWindowFunctions` on
  * [[PostgresDialect]]) — works over this backend and is protocol-tested
  * against the loopback server in `PgWindowFusionSpec`.
  *
  * Scale shape: `fetch` opens its socket ON THE TASK and streams
  * text-format rows through schema-compiled decoders, so result size is
  * bounded by executor memory (the same executor-side model as
  * `JdbcTaskConnection`); the driver only ever runs scalar planning
  * probes. Sessions are per-call — the protocol is one-query-in-flight,
  * and a pooled production deployment would wrap `PgWire.withSession`. */
object PgWireBackend {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, PgWireBackend]()

  /** `address` = "host:port/database[?user=name]" (user defaults to
    * "graft"; trust auth still requires the ROLE to exist server-side —
    * see tools/pg_live_runbook.sh). One backend per address, so every
    * table of one database shares a backend identity (the pushdown
    * rule's same-backend fusion check is reference equality). */
  def forAddress(address: String): PgWireBackend =
    cache.computeIfAbsent(address, a => new PgWireBackend(a))

  private[sources] def parse(address: String): (String, Int, String, String) = {
    val (base, user) = address.split("\\?", 2) match {
      case Array(b, q) => q.split("=", 2) match {
        case Array("user", u) if u.nonEmpty => (b, u)
        case _ => throw new IllegalArgumentException(
          s"pgwire address query part must be ?user=<name>, got: $address")
      }
      case Array(b) => (b, "graft")
    }
    base.split("/", 2) match {
      case Array(hp, db) => hp.split(":", 2) match {
        case Array(h, p) => (h, p.toInt, db, user)
        case _ => throw new IllegalArgumentException(
          s"pgwire address must be host:port/database[?user=name], got: $address")
      }
      case _ => throw new IllegalArgumentException(
        s"pgwire address must be host:port/database[?user=name], got: $address")
    }
  }

  /** information_schema `data_type` → Spark type. Same conversion table
    * as the reference (`datatypes.rs:141-176`) with the JdbcBackend's
    * documented divergences (uuid → String, interval/exotics → loud
    * decline); unconstrained NUMERIC defaults to Decimal(38,4) like the
    * reference's `datatypes.rs:160-162`. */
  private[graft] def sparkType(dataType: String, precision: Option[Int],
      scale: Option[Int]): DataType = dataType.toLowerCase match {
    case "boolean" => BooleanType
    case "smallint" => ShortType
    case "integer" => IntegerType
    case "bigint" => LongType
    case "real" => FloatType
    case "double precision" => DoubleType
    case "numeric" | "decimal" => (precision, scale) match {
      case (Some(p), Some(s))
          if p >= 1 && p <= DecimalType.MAX_PRECISION && s >= 0 && s <= p =>
        DecimalType(p, s)
      case _ => DecimalType(38, 4)
    }
    case "text" | "character varying" | "character" | "uuid" => StringType
    case "date" => DateType
    case "timestamp without time zone" => TimestampNTZType
    case "timestamp with time zone" => TimestampType
    case "bytea" => BinaryType
    case other => throw new IllegalArgumentException(
      s"pgwire: unmapped information_schema type '$other' — project it " +
        "away or cast it backend-side")
  }

  /** RowDescription type OID → Spark type, for queries whose schema the
    * caller didn't impose (driver-side probes). */
  private[graft] def oidType(oid: Int): DataType = {
    import PgWire.Oid._
    oid match {
      case Bool => BooleanType
      case Int2 => ShortType
      case Int4 => IntegerType
      case Int8 => LongType
      case Float4 => FloatType
      case Float8 => DoubleType
      case Numeric => DecimalType(38, 4)
      case Text | Varchar | Bpchar | Uuid => StringType
      case Date => DateType
      case Timestamp => TimestampNTZType
      case Timestamptz => TimestampType
      case Bytea => BinaryType
      case other => throw new IllegalArgumentException(
        s"pgwire: unmapped result type oid $other")
    }
  }

  /** Schema-compiled TEXT-format decoders — one closure per column, the
    * wire-text analog of `JdbcBackend.decoders` (and of the reference's
    * per-type readers, `binary_reader.rs:351-487`). Postgres text forms
    * are locale-free and documented: bool as t/f, timestamps as
    * `yyyy-MM-dd HH:mm:ss[.ffffff][+offset]`, bytea as `\x` hex. */
  private[graft] def textDecoders(schema: StructType): Array[String => Any] =
    schema.fields.map { f =>
      f.dataType match {
        case BooleanType => (s: String) => s == "t" || s == "true"
        case ShortType => (s: String) => s.toShort
        case IntegerType => (s: String) => s.toInt
        case LongType => (s: String) => s.toLong
        case FloatType => (s: String) => s.toFloat
        case DoubleType => (s: String) => s.toDouble
        case d: DecimalType => (s: String) =>
          new java.math.BigDecimal(s).setScale(d.scale, java.math.RoundingMode.HALF_UP)
        case StringType => (s: String) => s
        case DateType => (s: String) => java.sql.Date.valueOf(java.time.LocalDate.parse(s))
        case TimestampNTZType => (s: String) => parseLocal(s)
        case TimestampType => (s: String) => {
          // timestamptz text carries the session-zone offset suffix
          // (+HH[:MM]); normalize through Instant
          val (local, offset) = splitOffset(s)
          java.sql.Timestamp.from(
            parseLocal(local).toInstant(java.time.ZoneOffset.of(offset)))
        }
        case BinaryType => (s: String) => {
          require(s.startsWith("\\x"), s"pgwire bytea must be hex form: $s")
          val hex = s.drop(2)
          Array.tabulate(hex.length / 2)(i =>
            Integer.parseInt(hex.substring(i * 2, i * 2 + 2), 16).toByte)
        }
        case other => throw new IllegalArgumentException(
          s"pgwire: column '${f.name}' type $other has no text decoder")
      }
    }

  private def parseLocal(s: String): java.time.LocalDateTime =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))

  private def splitOffset(s: String): (String, String) = {
    val i = math.max(s.lastIndexOf('+'), s.lastIndexOf('-'))
    // the date's own dashes sit before position 8; a real offset is after
    // the time part
    if (i > 8) {
      val off = s.substring(i)
      val norm = if (off.length == 3) off + ":00" else off
      (s.substring(0, i), norm)
    } else (s, "+00:00")
  }

  private[graft] def decodeRow(values: Array[Option[String]],
      ds: Array[String => Any]): Row = {
    require(values.length == ds.length,
      s"pgwire row width ${values.length} != schema width ${ds.length}")
    val out = new Array[Any](ds.length)
    var i = 0
    while (i < ds.length) {
      out(i) = values(i) match { case Some(v) => ds(i)(v); case None => null }
      i += 1
    }
    Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  }
}

class PgWireBackend private (val address: String) extends SqlBackend {
  import PgWireBackend._

  private val (host, port, database, user) = PgWireBackend.parse(address)

  override def name: String = s"pgwire://$address"
  override def dialect: Dialect = PostgresDialect

  private def q(sql: String): (Seq[PgWire.Field], Vector[Array[Option[String]]]) =
    PgWire.withSession(host, port, database, user,
      PgWire.configuredPassword)(_.query(sql))

  /** Catalog discovery via hand-written information_schema SQL — the
    * reference's own approach (`mod.rs:67-125`); the JDBC backend's
    * DatabaseMetaData portability layer doesn't exist on a raw wire. */
  override def tables: Seq[String] =
    q("""SELECT "table_name" FROM "information_schema"."tables" WHERE "table_schema" = 'public' ORDER BY "table_name"""")
      ._2.flatMap(_.head).toSeq

  override def tableExists(table: String): Boolean = tables.contains(table)

  override def schema(table: String): StructType = {
    val lit = table.replace("'", "''")
    val rows = q(
      s"""SELECT "column_name", "data_type", "numeric_precision", "numeric_scale", "is_nullable", "ordinal_position"
         |FROM "information_schema"."columns" WHERE "table_schema" = 'public' AND "table_name" = '$lit'
         |ORDER BY "ordinal_position"""".stripMargin)._2
    require(rows.nonEmpty, s"no such table in $name: $table")
    StructType(rows.map { r =>
      StructField(r(0).get,
        sparkType(r(1).get, r(2).map(_.toInt), r(3).map(_.toInt)),
        nullable = !r(4).contains("NO"))
    }.toSeq)
  }

  /** Planner-stats estimate from pg_class.reltuples — metadata, not a
    * scan; -1 means never analyzed (no stats). Memoized per table for
    * the backend's lifetime (the same staleness tradeoff as
    * SparkViewBackend.rowCounts): the optimizer consults this once per
    * graft leaf per subtree level, and an unmemoized lookup would pay a
    * synchronous wire round-trip at every one of them. */
  @transient private lazy val rowCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Long]]()
  override def estimatedRowCount(table: String): Option[Long] =
    rowCountCache.computeIfAbsent(table, t =>
      try {
        val lit = t.replace("'", "''")
        q(s"""SELECT "reltuples" FROM "pg_class" WHERE "relname" = '$lit'""")
          ._2.headOption.flatMap(_.head).map(_.toDouble.toLong).filter(_ >= 0)
      } catch { case _: Exception => None }) // no pg_catalog on minimal fakes

  override def executeSql(sql: String): Seq[Row] = {
    val (fields, rows) = q(sql)
    val schema = StructType(fields.map(f => StructField(f.name, oidType(f.typeOid))))
    val ds = textDecoders(schema)
    rows.map(decodeRow(_, ds))
  }

  override def connection: SqlConnection = PgWireTaskConnection(address)

  override def executeSqlToRdd(sql: String, expected: StructType): RDD[InternalRow] = {
    val conn = PgWireTaskConnection(address) // driver-side: resolves binaryCopy
    SparkSession.active.sparkContext.parallelize(Seq(sql), 1).mapPartitions { it =>
      val ser = ExpressionEncoder(RowEncoder.encoderFor(expected)).createSerializer()
      it.flatMap(s => conn.fetch(0L, s, expected).map(r => ser(r).copy()))
    }
  }
}

/** Task-side wire connection: `fetch` opens a socket ON THE TASK and —
  * by default — reads via `COPY (sql) TO STDOUT (FORMAT binary)` decoded
  * straight through [[PgCopyDecoder]]: the reference's core read
  * architecture (`binary_reader.rs:24-209` + `mod.rs:133-168`), with no
  * per-value text parse and exact float/numeric round-trips. The
  * simple-query TEXT path remains as the fallback
  * (`-Dgraft.pgwire.binaryCopy=false`) for servers or types without a
  * binary arm — the flag is resolved DRIVER-side at plan time and rides
  * the serialized connection, so a driver-only `-D` reaches every
  * executor (unlike `graft.pgwire.password`, which is per-JVM secret
  * material and documented to ship via executor extraJavaOptions).
  * Either way the session closes with the stream's end or the task,
  * whichever comes first, so partial reads under a Spark-side limit
  * don't leak sockets. */
case class PgWireTaskConnection(address: String,
    binaryCopy: Boolean = PgWireTaskConnection.binaryCopyDefault)
    extends SqlConnection {
  override def fetch(id: Long, sql: String, schema: StructType): Iterator[Row] = {
    val (host, port, db, user) = PgWireBackend.parse(address)
    val session = new PgWire.Session(host, port, db, user,
      PgWire.configuredPassword)
    val exhausted = new java.util.concurrent.atomic.AtomicBoolean(false)
    // task end with the stream NOT drained = kill / timeout / abandoning
    // limit: fire the protocol's CancelRequest side-channel so the server
    // stops executing the (possibly fused) query, THEN close the socket —
    // close alone leaves a runaway query running until its next write
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit] { _ =>
        if (!exhausted.get()) session.cancel()
        session.close()
      })
    if (binaryCopy) binaryFetch(session, sql, schema, exhausted)
    else textFetch(session, sql, schema, exhausted)
  }

  /** Binary COPY read. A uuid column is StringType Spark-side but ships
    * as 16 raw bytes — learned (like the JDBC path's Describe probe) from
    * a LIMIT-0 RowDescription probe, issued only when the schema has
    * string columns that COULD be uuid; the probe doubles as an early
    * width check before the COPY starts. */
  private def binaryFetch(session: PgWire.Session, sql: String,
      schema: StructType,
      exhausted: java.util.concurrent.atomic.AtomicBoolean): Iterator[Row] = {
    val uuidCols: Set[String] =
      if (schema.fields.exists(_.dataType == StringType)) {
        val fs = session.fields(s"""SELECT * FROM ($sql) "__graft_probe" LIMIT 0""")
        require(fs.size == schema.size,
          s"pgwire result width ${fs.size} != expected ${schema.size} for: $sql")
        fs.iterator.zipWithIndex.collect {
          case (f, i) if f.typeOid == PgWire.Oid.Uuid => schema.fields(i).name
        }.toSet
      } else Set.empty
    val in = session.copyOut(s"COPY ($sql) TO STDOUT (FORMAT binary)")
    val rows = PgCopyDecoder.rows(in, schema, uuidCols)
    new Iterator[Row] {
      override def hasNext: Boolean = {
        val h = rows.hasNext
        if (!h && exhausted.compareAndSet(false, true)) session.close()
        h
      }
      override def next(): Row = rows.next()
    }
  }

  private def textFetch(session: PgWire.Session, sql: String,
      schema: StructType,
      exhausted: java.util.concurrent.atomic.AtomicBoolean): Iterator[Row] = {
    val ds = PgWireBackend.textDecoders(schema)
    val it = session.queryStream(sql) { fields =>
      require(fields.size == schema.size,
        s"pgwire result width ${fields.size} != expected ${schema.size} for: $sql")
    }
    new Iterator[Row] {
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && exhausted.compareAndSet(false, true)) session.close()
        h
      }
      override def next(): Row = PgWireBackend.decodeRow(it.next(), ds)
    }
  }
}

object PgWireTaskConnection {
  /** Read-path selector, resolved where the connection is CONSTRUCTED
    * (the driver, for planned scans) and then serialized into the task:
    * binary COPY by default. */
  private[graft] def binaryCopyDefault: Boolean =
    sys.props.getOrElse("graft.pgwire.binaryCopy", "true").toBoolean
}
