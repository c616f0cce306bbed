package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PgCopyDecoder

/** Golden-fixture tests for the PGCOPY binary decoder: bytes are
  * synthesized exactly as a Postgres server frames them (big-endian,
  * signature + flags + extension, i16 field count, i32 per-column length,
  * −1 sentinels for NULL and trailer) and decoded back to Rows — the
  * serverless proof the reference never had for its reader
  * (`/root/reference/src/sqldb/postgres/binary_reader.rs:490-523` needs a
  * live `postgresql://…/bench`). Every fixture writer mirrors the wire
  * rules of `binary_reader.rs:351-487`.
  */
class PgCopyDecoderSpec extends AnyFunSuite {

  /** Builder for PGCOPY wire bytes. */
  private class Wire {
    private val bytes = new ByteArrayOutputStream()
    private val out = new DataOutputStream(bytes)
    def header(flags: Int = 0, extension: Array[Byte] = Array.empty): this.type = {
      out.write("PGCOPY\n".getBytes("US-ASCII"))
      out.write(Array(0xff.toByte, '\r'.toByte, '\n'.toByte, 0x00.toByte))
      out.writeInt(flags)
      out.writeInt(extension.length)
      out.write(extension)
      this
    }
    def tuple(fields: (DataOutputStream => Unit)*): this.type = {
      out.writeShort(fields.length)
      fields.foreach(_(out))
      this
    }
    /** Raw field-count word — for framing-violation fixtures. */
    def fieldCount(n: Int): this.type = { out.writeShort(n); this }
    def trailer(): this.type = { out.writeShort(-1); this }
    def build(): ByteArrayInputStream = new ByteArrayInputStream(bytes.toByteArray)
  }

  private val NULL: DataOutputStream => Unit = _.writeInt(-1)
  private def boolF(v: Boolean): DataOutputStream => Unit =
    o => { o.writeInt(1); o.writeByte(if (v) 1 else 0) }
  private def int2F(v: Short): DataOutputStream => Unit = o => { o.writeInt(2); o.writeShort(v) }
  private def int4F(v: Int): DataOutputStream => Unit = o => { o.writeInt(4); o.writeInt(v) }
  private def int8F(v: Long): DataOutputStream => Unit = o => { o.writeInt(8); o.writeLong(v) }
  private def float4F(v: Float): DataOutputStream => Unit = o => { o.writeInt(4); o.writeFloat(v) }
  private def float8F(v: Double): DataOutputStream => Unit = o => { o.writeInt(8); o.writeDouble(v) }
  private def textF(v: String): DataOutputStream => Unit = o => {
    val b = v.getBytes("UTF-8"); o.writeInt(b.length); o.write(b)
  }
  private def byteaF(v: Array[Byte]): DataOutputStream => Unit =
    o => { o.writeInt(v.length); o.write(v) }
  /** `date`: i32 days since 2000-01-01. */
  private def dateF(daysSince2000: Int): DataOutputStream => Unit =
    o => { o.writeInt(4); o.writeInt(daysSince2000) }
  /** `timestamp`: i64 micros since 2000-01-01T00:00Z. */
  private def tsF(microsSince2000: Long): DataOutputStream => Unit =
    o => { o.writeInt(8); o.writeLong(microsSince2000) }
  /** `time`: i64 micros since midnight (8 wire bytes — the shape the
    * reference got wrong, `binary_reader.rs:437`). */
  private def timeF(micros: Long): DataOutputStream => Unit =
    o => { o.writeInt(8); o.writeLong(micros) }
  private def uuidF(hi: Long, lo: Long): DataOutputStream => Unit =
    o => { o.writeInt(16); o.writeLong(hi); o.writeLong(lo) }
  /** NUMERIC: base-10000 digit groups + weight + sign + dscale
    * (`binary_reader.rs:439-456`). */
  private def numericF(groups: Seq[Int], weight: Int, sign: Int,
      dscale: Int): DataOutputStream => Unit = o => {
    o.writeInt(8 + 2 * groups.length)
    o.writeShort(groups.length)
    o.writeShort(weight)
    o.writeShort(sign)
    o.writeShort(dscale)
    groups.foreach(o.writeShort)
  }

  /** `interval` (`interval_send`): i64 microseconds, i32 days, i32 months
    * — 16 wire bytes. The reference has no wire arm for interval at all
    * (`datatypes.rs:158` maps it at discovery only). */
  private def intervalF(micros: Long, days: Int, months: Int): DataOutputStream => Unit =
    o => { o.writeInt(16); o.writeLong(micros); o.writeInt(days); o.writeInt(months) }

  /** Array field (`array_send` framing): ndim, has-nulls, element OID,
    * per-dim size + lower bound, then the elements with their own length
    * words — the scalar field writers above already emit exactly that. */
  private def arrayF(elemOid: Int, hasNulls: Boolean, ndim: Int,
      elems: (DataOutputStream => Unit)*): DataOutputStream => Unit = o => {
    val body = new ByteArrayOutputStream()
    val bo = new DataOutputStream(body)
    bo.writeInt(ndim)
    bo.writeInt(if (hasNulls) 1 else 0)
    bo.writeInt(elemOid)
    if (ndim > 0) {
      bo.writeInt(elems.length)
      bo.writeInt(1) // Postgres default lower bound
    }
    elems.foreach(_(bo))
    o.writeInt(body.size)
    o.write(body.toByteArray)
  }

  private def decode(w: Wire, schema: StructType,
      uuidCols: Set[String] = Set.empty): Seq[Row] =
    PgCopyDecoder.rows(w.build(), schema, uuidCols).toSeq

  test("every supported type round-trips one tuple") {
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("s", ShortType),
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("f", FloatType), StructField("d", DoubleType),
      StructField("t", StringType), StructField("bin", BinaryType),
      StructField("dt", DateType), StructField("ts", TimestampType),
      StructField("tm", TimeType(6)), StructField("u", StringType),
      StructField("n", DecimalType(12, 2))))
    val w = new Wire().header()
      .tuple(boolF(true), int2F(7), int4F(-42), int8F(1L << 40),
        float4F(1.5f), float8F(-2.25),
        textF("naïve ✓"), byteaF(Array[Byte](0, 1, -1)),
        dateF(0),            // 2000-01-01
        tsF(86400000000L),   // 2000-01-02T00:00Z
        timeF(3661000001L),  // 01:01:01.000001
        uuidF(0x123456789abcdef0L, 0x0fedcba987654321L),
        numericF(Seq(1234, 5600), weight = 1, sign = 0x0000, dscale = 2)) // 12345600 grp → 1234.56? see below
      .trailer()
    val r = decode(w, schema, uuidCols = Set("u")).head
    assert(r.getBoolean(0) === true)
    assert(r.getShort(1) === 7)
    assert(r.getInt(2) === -42)
    assert(r.getLong(3) === (1L << 40))
    assert(r.getFloat(4) === 1.5f)
    assert(r.getDouble(5) === -2.25)
    assert(r.getString(6) === "naïve ✓")
    assert(r.getAs[Array[Byte]](7).toSeq === Seq[Byte](0, 1, -1))
    assert(r.getAs[java.sql.Date](8).toLocalDate === java.time.LocalDate.of(2000, 1, 1))
    assert(r.getAs[java.sql.Timestamp](9).toInstant ===
      java.time.Instant.parse("2000-01-02T00:00:00Z"))
    assert(r.getAs[java.time.LocalTime](10) === java.time.LocalTime.of(1, 1, 1, 1000))
    assert(r.getString(11) === "12345678-9abc-def0-0fed-cba987654321")
    // groups (1234)(5600) at weight 1 = 1234·10000¹ + 5600·10000⁰ … as the
    // INTEGER part — i.e. 12345600.00: the weight is the exponent of the
    // first group, so a true 1234.56 is groups (1234)(5600) at weight 0
    assert(r.getAs[java.math.BigDecimal](12) ===
      new java.math.BigDecimal("12345600.00"))
  }

  test("NUMERIC: weights, fractional groups, negatives, zero, rescale") {
    val schema = StructType(Seq(StructField("n", DecimalType(20, 4))))
    def one(groups: Seq[Int], weight: Int, sign: Int, dscale: Int): java.math.BigDecimal =
      decode(new Wire().header()
        .tuple(numericF(groups, weight, sign, dscale)).trailer(), schema)
        .head.getAs[java.math.BigDecimal](0)
    // 1234.5600: integer group + fractional group
    assert(one(Seq(1234, 5600), 0, 0x0000, 4) === new java.math.BigDecimal("1234.5600"))
    // pure fraction 0.0001 = group 1 at weight −1 (10000⁻¹)
    assert(one(Seq(1), -1, 0x0000, 4) === new java.math.BigDecimal("0.0001"))
    // deep fraction 0.00000001 would need weight −2 → rounds at scale 4
    assert(one(Seq(1), -2, 0x0000, 8) === new java.math.BigDecimal("0.0000"))
    // trailing-zero groups elided by the server: 50000000 = group 5000·10000¹
    assert(one(Seq(5000), 1, 0x0000, 0) === new java.math.BigDecimal("50000000.0000"))
    // negative
    assert(one(Seq(42), 0, 0x4000, 0) === new java.math.BigDecimal("-42.0000"))
    // zero ships as zero groups (`binary_reader.rs:453-456`)
    assert(one(Seq(), 0, 0x0000, 0) === new java.math.BigDecimal("0.0000"))
    // NaN (sign 0xC000) declines loudly instead of decoding garbage
    val ex = intercept[IllegalStateException] { one(Seq(), 0, 0xC000, 0) }
    assert(ex.getMessage.contains("NaN"))
  }

  test("NULLs, var-len offsets, and multi-tuple streams interleave") {
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("t", StringType),
      StructField("n", DecimalType(10, 2))))
    val w = new Wire().header()
      .tuple(int4F(1), textF(""), NULL)
      .tuple(int4F(2), NULL, numericF(Seq(7), 0, 0x0000, 0))
      .tuple(NULL, textF("after a null id — offsets must not shift"), NULL)
      .trailer()
    val rs = decode(w, schema)
    assert(rs.map(r => (r.get(0), r.get(1))) === Seq(
      (1, ""), (2, null),
      (null, "after a null id — offsets must not shift")))
    assert(rs(1).getAs[java.math.BigDecimal](2) === new java.math.BigDecimal("7.00"))
    assert(rs(0).isNullAt(2) && rs(2).isNullAt(2))
  }

  test("header extension area is skipped; EOF without trailer tolerated") {
    val schema = StructType(Seq(StructField("i", IntegerType)))
    val w = new Wire().header(extension = Array.fill[Byte](13)(0x55))
      .tuple(int4F(9)) // no trailer() — stream just ends
    assert(decode(w, schema).map(_.getInt(0)) === Seq(9))
  }

  test("bad signature and OID flag decline loudly") {
    val schema = StructType(Seq(StructField("i", IntegerType)))
    val bad = new ByteArrayInputStream(
      ("NOTPGCOPYxx" + "\u0000" * 4).getBytes("ISO-8859-1"))
    assert(intercept[IllegalStateException] {
      PgCopyDecoder.rows(bad, schema).toSeq
    }.getMessage.contains("signature"))

    assert(intercept[IllegalStateException] {
      decode(new Wire().header(flags = 0x10000).tuple(int4F(1)).trailer(), schema)
    }.getMessage.contains("OID"))
  }

  test("tuple width mismatch names both widths") {
    val schema = StructType(Seq(StructField("i", IntegerType)))
    val w = new Wire().header().fieldCount(3)
    val ex = intercept[IllegalStateException] {
      PgCopyDecoder.rows(w.build(), schema).toSeq
    }
    assert(ex.getMessage.contains("3 fields") && ex.getMessage.contains("schema has 1"))
  }

  test("fixed-width framing mismatch (schema drift) declines loudly") {
    // int8 bytes under an IntegerType schema: a silent 4-byte read would
    // desync every later column — the decoder must refuse
    val schema = StructType(Seq(StructField("i", IntegerType)))
    val w = new Wire().header().tuple(int8F(5L)).trailer()
    val ex = intercept[IllegalStateException] { decode(w, schema) }
    assert(ex.getMessage.contains("expected 4 wire bytes, got 8"))
  }

  test("pre-1970 timestamps and dates shift exactly (floor semantics)") {
    val schema = StructType(Seq(StructField("dt", DateType), StructField("ts", TimestampType)))
    // 1969-12-31 = day −10958 from 2000-01-01; 1969-12-31T23:59:59.999999Z
    val w = new Wire().header()
      .tuple(dateF(-10958), tsF(-946684800000001L + 1000000L - 1000000L))
      .trailer()
    val r = decode(w, schema).head
    assert(r.getAs[java.sql.Date](0).toLocalDate === java.time.LocalDate.of(1969, 12, 31))
    assert(r.getAs[java.sql.Timestamp](1).toInstant ===
      java.time.Instant.parse("1969-12-31T23:59:59.999999Z"))
  }

  test("decoded rows pass the scan's actual row serializer (encoder contract)") {
    // The COPY fast path feeds decoded Rows straight into
    // ExpressionEncoder(RowEncoder.encoderFor(schema)) — non-lenient, with
    // spark.sql.datetime.java8API.enabled unset — the serializer built at
    // JdbcBackend.fetch. That encoder accepts ONLY the java.sql external
    // types for DateType/TimestampType; java.time values ClassCastException
    // at runtime. This test drives every temporal + decimal + binary column
    // through the real serializer so the contract can never silently drift.
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    val schema = StructType(Seq(
      StructField("dt", DateType), StructField("ts", TimestampType),
      StructField("n", DecimalType(12, 2)), StructField("bin", BinaryType),
      StructField("t", StringType)))
    val w = new Wire().header()
      .tuple(dateF(0), tsF(86400000000L),
        numericF(Seq(1234, 5600), 0, 0x0000, 2), byteaF(Array[Byte](7)), textF("x"))
      .tuple(NULL, NULL, NULL, NULL, NULL)
      .trailer()
    val ser = ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
    val internal = PgCopyDecoder.rows(w.build(), schema).map(ser(_).copy()).toSeq
    assert(internal.length === 2)
    // days since Unix epoch for 2000-01-01 = 10957; micros for 2000-01-02T00:00Z
    assert(internal.head.getInt(0) === 10957)
    assert(internal.head.getLong(1) === 946684800000000L + 86400000000L)
    assert(internal.head.getDecimal(2, 12, 2).toJavaBigDecimal ===
      new java.math.BigDecimal("1234.56"))
    assert(internal(1).isNullAt(0) && internal(1).isNullAt(1) && internal(1).isNullAt(2))
  }

  test("interval: 16-byte wire form lands in all three Spark interval types") {
    import org.apache.spark.unsafe.types.CalendarInterval
    // interval '1 year 2 mons 3 days 04:05:06.789' as a server sends it:
    // months = 14, days = 3, micros = 4h5m6.789s = 14_706_789_000
    val full = new Wire().header()
      .tuple(intervalF(14706789000L, 3, 14)).trailer()
    val ci = decode(full,
      StructType(Seq(StructField("iv", CalendarIntervalType)))).head
      .getAs[CalendarInterval](0)
    assert(ci === new CalendarInterval(14, 3, 14706789000L))

    // month-free interval → DayTimeIntervalType (java.time.Duration),
    // days folded at 24 h/day — Spark's own day-time arithmetic
    val dt = decode(new Wire().header()
        .tuple(intervalF(-5000001L, 2, 0)).trailer(),
      StructType(Seq(StructField("iv", DayTimeIntervalType())))).head
      .getAs[java.time.Duration](0)
    assert(dt === java.time.Duration.ofDays(2).minusSeconds(5).minusNanos(1000))

    // time-free interval → YearMonthIntervalType (java.time.Period)
    val ym = decode(new Wire().header()
        .tuple(intervalF(0L, 0, 26)).trailer(),
      StructType(Seq(StructField("iv", YearMonthIntervalType())))).head
      .getAs[java.time.Period](0)
    assert(ym === java.time.Period.of(2, 2, 0))

    // NULL column is the ordinary sentinel
    val nul = decode(new Wire().header().tuple(NULL).trailer(),
      StructType(Seq(StructField("iv", CalendarIntervalType)))).head
    assert(nul.isNullAt(0))
  }

  test("interval: wire values outside the declared column shape decline loudly") {
    // months on a day-time column would silently vanish from a Duration
    val m = intercept[IllegalStateException] {
      decode(new Wire().header().tuple(intervalF(0L, 0, 7)).trailer(),
        StructType(Seq(StructField("iv", DayTimeIntervalType()))))
    }
    assert(m.getMessage.contains("months"))
    // days/micros on a year-month column likewise
    val d = intercept[IllegalStateException] {
      decode(new Wire().header().tuple(intervalF(1L, 0, 12)).trailer(),
        StructType(Seq(StructField("iv", YearMonthIntervalType()))))
    }
    assert(d.getMessage.contains("year-month"))
    // wrong wire width (schema drift) refuses rather than desyncs
    val w = intercept[IllegalStateException] {
      decode(new Wire().header().tuple(int8F(5L)).trailer(),
        StructType(Seq(StructField("iv", CalendarIntervalType))))
    }
    assert(w.getMessage.contains("expected 16 wire bytes, got 8"))
  }

  test("arrays: every reference-enumerated element type round-trips") {
    // the reference maps BOOL/INT2..FLOAT8/TIMESTAMP _ARRAY → List<T>
    // (`datatypes.rs:28-80`) but its decoder is knowingly broken
    // (`binary_reader.rs:308-320`); these are the wire-true fixtures
    val schema = StructType(Seq(
      StructField("ls", ArrayType(LongType)),
      StructField("ts", ArrayType(StringType)),
      StructField("fs", ArrayType(DoubleType)),
      StructField("stamps", ArrayType(TimestampType))))
    val w = new Wire().header()
      .tuple(
        arrayF(20, hasNulls = true, ndim = 1, int8F(1L), NULL, int8F(3L)),
        arrayF(25, hasNulls = false, ndim = 1, textF("a"), textF("naïve ✓"), textF("")),
        arrayF(701, hasNulls = false, ndim = 1, float8F(-2.25), float8F(0.5)),
        arrayF(1114, hasNulls = false, ndim = 1, tsF(86400000000L)))
      .trailer()
    val r = decode(w, schema).head
    assert(r.getAs[Seq[Any]](0) === Seq(1L, null, 3L))
    assert(r.getAs[Seq[String]](1) === Seq("a", "naïve ✓", ""))
    assert(r.getAs[Seq[Double]](2) === Seq(-2.25, 0.5))
    assert(r.getAs[Seq[java.sql.Timestamp]](3).map(_.toInstant) ===
      Seq(java.time.Instant.parse("2000-01-02T00:00:00Z")))
  }

  test("arrays: empty (ndim 0), NULL column, and framing guards") {
    val schema = StructType(Seq(StructField("ls", ArrayType(LongType))))
    // empty array ships as ndim = 0 with no dimension words at all
    val empty = decode(new Wire().header()
      .tuple(arrayF(20, hasNulls = false, ndim = 0)).trailer(), schema).head
    assert(empty.getAs[Seq[Any]](0) === Seq.empty)
    // a NULL array column is the ordinary −1 length sentinel
    val nul = decode(new Wire().header().tuple(NULL).trailer(), schema).head
    assert(nul.isNullAt(0))
    // 2-D wire arrays cannot map to a flat ArrayType — decline loudly
    val twoD = intercept[IllegalStateException] {
      decode(new Wire().header()
        .tuple(arrayF(20, hasNulls = false, ndim = 2, int8F(1L))).trailer(), schema)
    }
    assert(twoD.getMessage.contains("2-dimensional"))
    // an element count the declared byte length cannot hold — decline,
    // never read past the field into the next column's bytes
    val lying = intercept[IllegalStateException] {
      decode(new Wire().header().tuple { o =>
        o.writeInt(20) // field length: exactly the header, no room for elements
        o.writeInt(1); o.writeInt(0); o.writeInt(20)
        o.writeInt(1000000); o.writeInt(1)
      }.trailer(), schema)
    }
    assert(lying.getMessage.contains("cannot fit"))
  }

  test("arrays: decoded rows load into a DataFrame (encoder contract)") {
    val spark = TestSpark.spark
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("xs", ArrayType(LongType))))
    val w = new Wire().header()
      .tuple(int4F(1), arrayF(20, hasNulls = false, ndim = 1, int8F(10L), int8F(20L)))
      .tuple(int4F(2), NULL)
      .trailer()
    val rows = PgCopyDecoder.rows(w.build(), schema).toSeq
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val got = df.orderBy("id").collect()
    assert(got(0).getAs[Seq[Long]]("xs") === Seq(10L, 20L))
    assert(got(1).isNullAt(1))
  }

  test("decoded rows load into a DataFrame with the discovery schema") {
    // end-to-end shape check: the Rows this decoder emits are accepted by
    // the same createDataFrame path the ResultSet decoder feeds
    val spark = TestSpark.spark
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("bal", DecimalType(12, 2)), StructField("since", DateType)))
    val w = new Wire().header()
      .tuple(int4F(1), textF("acme"), numericF(Seq(1234, 5600), 0, 0x0000, 4), dateF(365))
      .tuple(int4F(2), NULL, NULL, NULL)
      .trailer()
    val rows = PgCopyDecoder.rows(w.build(), schema).toSeq
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val got = df.orderBy("id").collect()
    assert(got.length === 2)
    assert(got(0).getAs[java.math.BigDecimal]("bal") === new java.math.BigDecimal("1234.56"))
    assert(got(0).getAs[java.sql.Date]("since").toLocalDate === java.time.LocalDate.of(2000, 12, 31))
    assert(got(1).isNullAt(1) && got(1).isNullAt(2) && got(1).isNullAt(3))
  }
}
