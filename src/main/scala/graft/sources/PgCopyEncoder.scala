package graft.sources

import java.io.{DataOutputStream, OutputStream}
import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Encoder for the PostgreSQL binary `COPY` wire format — the write-side
  * inverse of [[PgCopyDecoder]], and the piece the reference never had at
  * all (its write surface is absent; `src/sqldb/postgres/mod.rs` only
  * reads). Binary COPY is the bulk-ingest path a 100 TB pipeline actually
  * uses against Postgres-family backends: one framed stream per task
  * instead of per-row INSERT round trips. The encoder plugs into the same
  * documented pgjdbc `CopyManager` seam as the read side
  * (`JdbcBackend.decodeRow`'s caller); until a live server is reachable it
  * is proven by byte-exact round trips through [[PgCopyDecoder]] and
  * golden wire fixtures.
  *
  * Framing mirrors the decoder: 11-byte signature, u32 flags = 0, u32
  * extension length = 0, per tuple an i16 field count then per field an
  * i32 byte length (−1 = NULL) and the big-endian payload, i16 −1 trailer.
  * Per-type encodings are the exact inverses of the decoder's readers,
  * including the 8-byte `time` and the base-10000 NUMERIC.
  */
object PgCopyEncoder {

  /** Postgres type OIDs for array element headers (`pg_type.oid`) — needed
    * by a real server to interpret `array_send` payloads. CAVEAT: the
    * server's `array_recv` checks the element OID against the COLUMN's
    * declared element type, and this client-side map cannot see the column
    * (a varchar[] column wants 1043, not text's 25) — which is one reason
    * [[SqlWrite.writable]] keeps ArrayType off the write surface for now;
    * these OIDs serve the default text/timestamp/numeric spellings. */
  private def elementOid(dt: DataType): Int = dt match {
    case BooleanType => 16
    case ByteType | ShortType => 21
    case IntegerType => 23
    case LongType => 20
    case FloatType => 700
    case DoubleType => 701
    case StringType => 25
    case BinaryType => 17
    case DateType => 1082
    case TimestampType | TimestampNTZType => 1114
    case _: TimeType => 1083
    case _: DecimalType => 1700
    case CalendarIntervalType | _: DayTimeIntervalType |
         _: YearMonthIntervalType => 1186
    case _ => 0
  }

  /** Can every column of `schema` be encoded? The write path asks BEFORE
    * opening a COPY — a constructor throw after the stream opened would
    * leak the connection and fail a write the INSERT path handles. */
  def supports(schema: StructType): Boolean =
    schema.fields.forall { f =>
      try { writerFor(f, Set.empty); true }
      catch { case _: IllegalArgumentException => false }
    }

  private type FieldWriter = (DataOutputStream, Any) => Unit

  private def fixed(n: Int)(f: (DataOutputStream, Any) => Unit): FieldWriter =
    (o, v) => { o.writeInt(n); f(o, v) }

  /** NUMERIC: decompose a BigDecimal into base-10000 digit groups with the
    * weight of the first group — the exact inverse of the decoder's
    * reconstruction (Σ groupᵢ · 10000^(weight−i), rescaled). Leading and
    * trailing zero groups are elided the way a server elides them. */
  private def writeNumeric(o: DataOutputStream, v: JBigDecimal): Unit = {
    val dscale = math.max(v.scale, 0)
    val neg = v.signum < 0
    val abs = v.abs.stripTrailingZeros
    if (abs.signum == 0) { // zero ships as zero groups
      o.writeInt(8)
      o.writeShort(0); o.writeShort(0); o.writeShort(0); o.writeShort(dscale)
      return
    }
    // align the fractional digit count to a multiple of 4 so digits split
    // exactly into base-10000 groups around the decimal point
    val scaleUp = ((abs.scale % 4) + 4) % 4 match {
      case 0 => abs
      case r => abs.setScale(abs.scale + (4 - r))
    }
    val unscaled = scaleUp.unscaledValue // positive
    val fracGroups = scaleUp.scale / 4
    var digits = unscaled
    val tenK = java.math.BigInteger.valueOf(10000L)
    var groups = List.empty[Int]
    while (digits.signum != 0) {
      val Array(q, r) = digits.divideAndRemainder(tenK)
      groups = r.intValue :: groups
      digits = q
    }
    if (groups.isEmpty) groups = List(0)
    // weight = exponent (base 10000) of the FIRST group
    var weight = groups.length - 1 - fracGroups
    // elide leading zero groups (weight unchanged beyond the drop) and
    // trailing zero groups (pure representation, value carried by weight)
    var gs = groups
    while (gs.nonEmpty && gs.head == 0) { gs = gs.tail; weight -= 1 }
    while (gs.nonEmpty && gs.last == 0) gs = gs.init
    o.writeInt(8 + 2 * gs.length)
    o.writeShort(gs.length)
    o.writeShort(weight)
    o.writeShort(if (neg) 0x4000 else 0x0000)
    o.writeShort(dscale)
    gs.foreach(o.writeShort)
  }

  private def scalarWriter(dt: DataType, uuid: Boolean): FieldWriter = dt match {
    case BooleanType => fixed(1)((o, v) => o.writeByte(if (v.asInstanceOf[Boolean]) 1 else 0))
    // Postgres has no 1-byte integer: a ByteType column lands in an int2
    // backend column (DDL maps it so), hence 2 wire bytes
    case ByteType => fixed(2)((o, v) => o.writeShort(v.asInstanceOf[Byte].toShort))
    case ShortType => fixed(2)((o, v) => o.writeShort(v.asInstanceOf[Short]))
    case IntegerType => fixed(4)((o, v) => o.writeInt(v.asInstanceOf[Int]))
    case LongType => fixed(8)((o, v) => o.writeLong(v.asInstanceOf[Long]))
    case FloatType => fixed(4)((o, v) => o.writeFloat(v.asInstanceOf[Float]))
    case DoubleType => fixed(8)((o, v) => o.writeDouble(v.asInstanceOf[Double]))
    case StringType if uuid => fixed(16) { (o, v) =>
      val u = java.util.UUID.fromString(v.toString)
      o.writeLong(u.getMostSignificantBits); o.writeLong(u.getLeastSignificantBits)
    }
    case StringType => (o, v) => {
      val b = v.toString.getBytes("UTF-8")
      o.writeInt(b.length); o.write(b)
    }
    case BinaryType => (o, v) => {
      val b = v.asInstanceOf[Array[Byte]]
      o.writeInt(b.length); o.write(b)
    }
    case DateType => fixed(4) { (o, v) =>
      val days = v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay
      o.writeInt((days - PgCopyDecoder.EpochDays).toInt)
    }
    case TimestampType => fixed(8) { (o, v) =>
      val t = v.asInstanceOf[java.sql.Timestamp]
      // floorDiv keeps pre-1970 instants exact (getNanos is always the
      // non-negative sub-second part, so seconds must round toward −∞)
      val micros = Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      o.writeLong(micros - PgCopyDecoder.EpochMicros)
    }
    // NTZ is the direct mapping for Postgres `timestamp`: the external
    // LocalDateTime IS the wall-clock the wire carries — no zone math
    case TimestampNTZType => fixed(8) { (o, v) =>
      val t = v.asInstanceOf[java.time.LocalDateTime]
      val micros = Math.addExact(Math.multiplyExact(
        t.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
        (t.getNano / 1000).toLong)
      o.writeLong(micros - PgCopyDecoder.EpochMicros)
    }
    case _: TimeType => fixed(8) { (o, v) =>
      o.writeLong(v.asInstanceOf[java.time.LocalTime].toNanoOfDay / 1000L)
    }
    case _: DecimalType => (o, v) =>
      writeNumeric(o, v.asInstanceOf[JBigDecimal])
    // Postgres `interval_recv`: i64 microseconds, i32 days, i32 months —
    // the inverse of the decoder's three interval readers. multiplyExact/
    // addExact fail loudly on a Duration beyond ±~292k years instead of
    // shipping a silently wrapped value.
    case CalendarIntervalType => fixed(16) { (o, v) =>
      val ci = v.asInstanceOf[org.apache.spark.unsafe.types.CalendarInterval]
      o.writeLong(ci.microseconds); o.writeInt(ci.days); o.writeInt(ci.months)
    }
    case _: DayTimeIntervalType => fixed(16) { (o, v) =>
      val d = v.asInstanceOf[java.time.Duration]
      val micros = Math.addExact(
        Math.multiplyExact(d.getSeconds, 1000000L), d.getNano / 1000L)
      o.writeLong(micros); o.writeInt(0); o.writeInt(0)
    }
    case _: YearMonthIntervalType => fixed(16) { (o, v) =>
      val p = v.asInstanceOf[java.time.Period]
      if (p.getDays != 0) throw new IllegalStateException(
        s"PGCOPY interval: a year-month column cannot carry ${p.getDays} days")
      o.writeLong(0L); o.writeInt(0)
      o.writeInt(Math.toIntExact(p.toTotalMonths))
    }
    case other => throw new IllegalArgumentException(
      s"PGCOPY encode: no wire writer for $other")
  }

  /** Postgres composite / `record` (`record_send`): i32 field count, then
    * per field a u32 type OID, an i32 length (−1 = NULL), and the payload
    * in the field type's own send format — the write-side inverse of the
    * decoder's [[PgCopyDecoder]] record arm. Fields are positional (the
    * wire carries no names). A server's `record_recv` additionally checks
    * the OIDs against the DECLARED composite type, which this client-side
    * map cannot see — the same documented caveat as array element OIDs. */
  private def recordWriter(st: StructType, uuidCols: Set[String]): FieldWriter = {
    val writers = st.fields.map(writerFor(_, uuidCols))
    val oids = st.fields.map(f => f.dataType match {
      case _: StructType => 2249 // pg_type: anonymous record
      case ArrayType(et, _) => arrayOidFor(et)
      case dt => elementOid(dt)
    })
    (o, v) => {
      val row = v.asInstanceOf[Row]
      if (row.length != writers.length) throw new IllegalStateException(
        s"PGCOPY record: row has ${row.length} fields but the declared " +
          s"StructType has ${writers.length}")
      val bytes = new java.io.ByteArrayOutputStream()
      val bo = new DataOutputStream(bytes)
      bo.writeInt(writers.length)
      var i = 0
      while (i < writers.length) {
        bo.writeInt(oids(i))
        if (row.isNullAt(i)) bo.writeInt(-1) else writers(i)(bo, row.get(i))
        i += 1
      }
      o.writeInt(bytes.size)
      bytes.writeTo(o)
    }
  }

  /** OID of the ARRAY type over element type `et` (pg_type `typarray`) —
    * needed when an array is itself a record field. Nested arrays share
    * the same array OID (Postgres arrays are one type at any ndim). */
  private def arrayOidFor(et: DataType): Int = {
    var leaf = et
    while (leaf.isInstanceOf[ArrayType]) leaf = leaf.asInstanceOf[ArrayType].elementType
    leaf match {
      case BooleanType => 1000
      case ByteType | ShortType => 1005
      case IntegerType => 1007
      case LongType => 1016
      case FloatType => 1021
      case DoubleType => 1022
      case StringType => 1009
      case BinaryType => 1001
      case DateType => 1182
      case TimestampType | TimestampNTZType => 1115
      case _: TimeType => 1183
      case _: DecimalType => 1231
      case _: StructType => 2287 // _record
      case _ => 0
    }
  }

  private def writerFor(f: StructField, uuidCols: Set[String]): FieldWriter =
    f.dataType match {
      case st: StructType => recordWriter(st, uuidCols)
      case at: ArrayType =>
        // nesting depth → wire ndim; the element writer is for the leaf
        // scalar. Postgres multi-dim arrays are rectangular and have no
        // sub-array slots, so a jagged or null-sub-array value has no wire
        // form — decline loudly rather than pad or flatten.
        var leaf: DataType = at.elementType
        var depth = 1
        while (leaf.isInstanceOf[ArrayType]) {
          depth += 1
          leaf = leaf.asInstanceOf[ArrayType].elementType
        }
        val elem = leaf match {
          case st: StructType => recordWriter(st, uuidCols)
          case dt => scalarWriter(dt, uuidCols.contains(f.name))
        }
        val oid = leaf match {
          case _: StructType => 2249
          case StringType if uuidCols.contains(f.name) => 2950
          case dt => elementOid(dt)
        }
        (o, v) => {
          // flatten row-major, learning each dimension's size from the
          // first sub-array seen at that level and checking every sibling
          val dims = new Array[Int](depth)
          val seen = new Array[Boolean](depth)
          val flat = new scala.collection.mutable.ArrayBuffer[Any]()
          def walk(x: Any, level: Int): Unit =
            if (level == depth) flat += x
            else {
              if (x == null) throw new IllegalStateException(
                s"PGCOPY array: a NULL sub-array at depth $level has no wire " +
                  "form (Postgres arrays are rectangular; only leaf elements may be NULL)")
              val s = x.asInstanceOf[scala.collection.Seq[Any]]
              if (!seen(level)) { dims(level) = s.length; seen(level) = true }
              else if (s.length != dims(level)) throw new IllegalStateException(
                s"PGCOPY array: jagged nested array (sub-array of ${s.length} " +
                  s"elements where ${dims(level)} expected at depth $level) — " +
                  "Postgres multidimensional arrays are rectangular")
              s.foreach(walk(_, level + 1))
            }
          walk(v, 0)
          // body framed separately: the field length prefix needs the size
          val bytes = new java.io.ByteArrayOutputStream()
          val bo = new DataOutputStream(bytes)
          if (flat.isEmpty) {
            // Postgres normalizes every zero-element array to `{}` (ndim 0,
            // no dimension words) — inner structure of [[],[]] is dropped
            // the same way the server drops it
            bo.writeInt(0); bo.writeInt(0); bo.writeInt(oid)
          } else {
            bo.writeInt(depth)
            bo.writeInt(if (flat.exists(_ == null)) 1 else 0)
            bo.writeInt(oid)
            var d = 0
            while (d < depth) {
              bo.writeInt(dims(d))
              bo.writeInt(1) // Postgres default lower bound
              d += 1
            }
            flat.foreach {
              case null => bo.writeInt(-1)
              case e => elem(bo, e)
            }
          }
          o.writeInt(bytes.size)
          bytes.writeTo(o)
        }
      case dt => scalarWriter(dt, uuidCols.contains(f.name))
    }

  /** Incremental PGCOPY stream: the header goes out at construction, rows
    * as they arrive, and the trailer at [[finish]] — the shape a task-side
    * writer needs (rows stream through, nothing buffers). `uuidCols` names
    * StringType columns that must ship as 16-byte uuids — the same
    * contract as the decoder's. */
  final class Stream(out: OutputStream, schema: StructType,
      uuidCols: Set[String] = Set.empty) {
    private val o = new DataOutputStream(out)
    private val writers = schema.fields.map(writerFor(_, uuidCols))
    private val width = writers.length
    o.write(PgCopyDecoder.Magic)
    o.writeInt(0) // flags: no OIDs
    o.writeInt(0) // no header extension

    def writeRow(row: Row): Unit = {
      o.writeShort(width)
      var i = 0
      while (i < width) {
        if (row.isNullAt(i)) o.writeInt(-1) else writers(i)(o, row.get(i))
        i += 1
      }
    }

    /** Trailer + flush. The underlying stream stays open — its lifecycle
      * (a COPY end, a file close) belongs to the caller. */
    def finish(): Unit = {
      o.writeShort(-1)
      o.flush()
    }
  }

  /** Encode `rows` onto `out` as one complete PGCOPY stream (header,
    * tuples, trailer). */
  def write(rows: Iterator[Row], schema: StructType, out: OutputStream,
      uuidCols: Set[String] = Set.empty): Unit = {
    val s = new Stream(out, schema, uuidCols)
    rows.foreach(s.writeRow)
    s.finish()
  }

  /** Convenience: encode to a byte array (fixtures, small batches). */
  def bytes(rows: Seq[Row], schema: StructType,
      uuidCols: Set[String] = Set.empty): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    write(rows.iterator, schema, out, uuidCols)
    out.toByteArray
  }
}
