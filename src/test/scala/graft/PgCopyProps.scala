package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.PgCopyDecoder

/** Property round-trips for the PGCOPY binary decoder: random tuples of
  * random widths — scalars, NULLs, and 1-D arrays with NULL elements —
  * framed exactly as a server sends them must decode back to the same
  * values. The golden fixtures in `PgCopyDecoderSpec` pin the wire rules;
  * these pin that no VALUE shape (sign, emptiness, unicode, null
  * placement, length) can desync the framing. */
object PgCopyProps extends Properties("PgCopyDecoder") {

  private def frame(rows: Seq[Seq[Option[Any]]], schema: StructType): ByteArrayInputStream = {
    val bytes = new ByteArrayOutputStream()
    val o = new DataOutputStream(bytes)
    o.write("PGCOPY\n".getBytes("US-ASCII"))
    o.write(Array(0xff.toByte, '\r'.toByte, '\n'.toByte, 0x00.toByte))
    o.writeInt(0); o.writeInt(0)
    def writeScalar(v: Any): Unit = v match {
      case l: Long => o.writeInt(8); o.writeLong(l)
      case i: Int => o.writeInt(4); o.writeInt(i)
      case d: Double => o.writeInt(8); o.writeDouble(d)
      case s: String =>
        val b = s.getBytes("UTF-8"); o.writeInt(b.length); o.write(b)
      case other => throw new IllegalArgumentException(s"gen: $other")
    }
    rows.foreach { row =>
      o.writeShort(row.length)
      row.zip(schema.fields).foreach {
        case (None, _) => o.writeInt(-1)
        case (Some(elems: Seq[_]), f) if f.dataType.isInstanceOf[ArrayType] =>
          val body = new ByteArrayOutputStream()
          val bo = new DataOutputStream(body)
          bo.writeInt(1); bo.writeInt(1); bo.writeInt(0) // ndim, hasnull, oid
          bo.writeInt(elems.length); bo.writeInt(1)
          val saved = o
          elems.foreach {
            case None => bo.writeInt(-1)
            case Some(v) =>
              // route the element through writeScalar against the body
              val tmp = new ByteArrayOutputStream()
              val to = new DataOutputStream(tmp)
              v match {
                case l: Long => to.writeInt(8); to.writeLong(l)
                case s: String =>
                  val b = s.getBytes("UTF-8"); to.writeInt(b.length); to.write(b)
                case d: Double => to.writeInt(8); to.writeDouble(d)
                case other => throw new IllegalArgumentException(s"gen elem: $other")
              }
              bo.write(tmp.toByteArray)
          }
          saved.writeInt(body.size)
          saved.write(body.toByteArray)
        case (Some(v), _) => writeScalar(v)
      }
    }
    o.writeShort(-1)
    new ByteArrayInputStream(bytes.toByteArray)
  }

  private val genStr: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20)), Gen.const(""), Gen.const("naïve ✓ \n\t"),
    Gen.const("it's \"quoted\" \\ back"))

  private val genScalarRow: Gen[Seq[Option[Any]]] = for {
    l <- Gen.option(Gen.choose(Long.MinValue, Long.MaxValue))
    i <- Gen.option(Gen.choose(Int.MinValue, Int.MaxValue))
    d <- Gen.option(Gen.oneOf(Gen.choose(-1e18, 1e18), Gen.const(0.0), Gen.const(-0.0)))
    s <- Gen.option(genStr)
  } yield Seq(l, i, d, s)

  private val scalarSchema = StructType(Seq(
    StructField("l", LongType), StructField("i", IntegerType),
    StructField("d", DoubleType), StructField("s", StringType)))

  property("random scalar tuples round-trip without framing desync") =
    forAll(Gen.listOfN(8, genScalarRow)) { rows =>
      val got = PgCopyDecoder.rows(frame(rows, scalarSchema), scalarSchema).toSeq
      got.length == rows.length && got.zip(rows).forall { case (r, want) =>
        want.zipWithIndex.forall {
          case (None, idx) => r.isNullAt(idx)
          case (Some(v), idx) => r.get(idx) == v
        }
      }
    }

  property("random decimals round-trip through encoder AND decoder") = {
    // the encoder's base-10000 NUMERIC decomposition (group split around
    // the decimal point, weight, zero-group elision) is the trickiest wire
    // encode — drive it with random unscaled values and scales, verified
    // through the independently-fixture-tested decoder
    val genDec: Gen[java.math.BigDecimal] = for {
      unscaled <- Gen.oneOf(
        Gen.choose(-999999999999999999L, 999999999999999999L),
        Gen.oneOf(0L, 1L, -1L, 10000L, -10000L, 99999999L, 100000000L))
      scale <- Gen.choose(0, 8)
    } yield new java.math.BigDecimal(java.math.BigInteger.valueOf(unscaled), scale)
      .setScale(8, java.math.RoundingMode.UNNECESSARY)
    val schema = StructType(Seq(StructField("n", DecimalType(30, 8))))
    forAll(Gen.listOfN(12, Gen.option(genDec))) { vals =>
      val rows = vals.map(v => org.apache.spark.sql.Row(v.orNull))
      val bytes = graft.sources.PgCopyEncoder.bytes(rows, schema)
      val got = PgCopyDecoder.rows(new ByteArrayInputStream(bytes), schema).toSeq
      got.length == vals.length && got.zip(vals).forall {
        case (r, None) => r.isNullAt(0)
        case (r, Some(want)) =>
          r.getAs[java.math.BigDecimal](0).compareTo(want) == 0
      }
    }
  }

  private val genArrayRow: Gen[Seq[Option[Any]]] = for {
    ls <- Gen.option(Gen.listOf(Gen.option(Gen.choose(Long.MinValue, Long.MaxValue))))
    ss <- Gen.option(Gen.listOf(Gen.option(genStr)))
  } yield Seq(ls, ss)

  private val arraySchema = StructType(Seq(
    StructField("ls", ArrayType(LongType)), StructField("ss", ArrayType(StringType))))

  property("random arrays (with null elements) round-trip") =
    forAll(Gen.listOfN(6, genArrayRow)) { rows =>
      val got = PgCopyDecoder.rows(frame(rows, arraySchema), arraySchema).toSeq
      got.length == rows.length && got.zip(rows).forall { case (r, want) =>
        want.zipWithIndex.forall {
          case (None, idx) => r.isNullAt(idx)
          case (Some(elems: Seq[_]), idx) =>
            val decoded = r.getAs[scala.collection.Seq[Any]](idx)
            decoded.length == elems.length && decoded.zip(elems).forall {
              case (null, None) => true
              case (g, Some(w)) => g == w
              case _ => false
            }
          case _ => false
        }
      }
    }

  property("random rectangular 2-D arrays round-trip encoder->decoder") = {
    // any rectangular shape (incl. degenerate 0×k / k×0, which Postgres
    // normalizes to `{}`) with leaf NULLs anywhere must survive the
    // flatten → dims framing → reshape cycle
    val leaf = Gen.option(Gen.choose(Long.MinValue, Long.MaxValue))
    val genGrid = for {
      rows <- Gen.choose(0, 5)
      cols <- Gen.choose(0, 5)
      grid <- Gen.listOfN(rows, Gen.listOfN(cols, leaf))
    } yield grid.map(_.map(_.map(Long.box).orNull))
    val schema = StructType(Seq(StructField("g", ArrayType(ArrayType(LongType)))))
    forAll(genGrid) { grid =>
      val wire = graft.sources.PgCopyEncoder.bytes(
        Seq(org.apache.spark.sql.Row(grid)), schema)
      val got = PgCopyDecoder.rows(new ByteArrayInputStream(wire), schema)
        .toSeq.head.getAs[scala.collection.Seq[scala.collection.Seq[Any]]](0)
      val expect = if (grid.isEmpty || grid.head.isEmpty) Seq.empty else grid
      got == expect
    }
  }
}
