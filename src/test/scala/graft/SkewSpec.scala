package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join returns exactly the rows of the plain join") {
    val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val o = Tables.load(spark, TestSpark.Sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    val plain = li.join(o, Seq("o_orderkey"))
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(li, o, Seq("o_orderkey"), saltFactor = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(salted.size == plain.size)
    assert(salted == plain)
  }

  test("salting works on schemas with map columns (unhashable by xxhash64)") {
    val ev = Tables.load(spark, TestSpark.Sf0001, "events") // props is a map
      .select(col("user_id"), col("event_type"), col("props"))
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("tag", concat(lit("t_"), col("event_type")))
    val plain = ev.join(dim, Seq("event_type"))
      .select("user_id", "event_type", "tag")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(ev, dim, Seq("event_type"), saltFactor = 4)
      .select("user_id", "event_type", "tag")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("salted two-phase aggregate equals direct groupBy") {
    val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_l_quantity"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    val salted = Skew.saltedCountSum(li, Seq("l_returnflag"), "l_quantity", 8)
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    assert(salted == direct)
  }
}
