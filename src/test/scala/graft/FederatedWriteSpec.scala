package graft

import graft.sources.SparkViewBackend
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Federated write path: INSERT INTO the backend through DSv2
  * SupportsWrite, and CREATE/DROP TABLE through the catalog plugin. */
class FederatedWriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def backend = {
    spark.range(1).count() // ensure an active session for the double
    SparkViewBackend.forDir(TestSpark.Sf0001)
  }

  private def remote(table: String) =
    spark.read.format("graft-sqldb")
      .option("dir", TestSpark.Sf0001)
      .option("table", table)
      .load()

  test("append writes render batched INSERTs executed at global commit") {
    val b = backend
    b.executeUpdate("CREATE TABLE w_sink (id BIGINT, name STRING, score DOUBLE, ok BOOLEAN)")
    try {
      val df = Seq(
        (1L, "plain", 1.5, true),
        (2L, "quote's", 2.5, false),
        (3L, "back\\slash", Double.NaN, true),
        (4L, null.asInstanceOf[String], -0.0, false),
      ).toDF("id", "name", "score", "ok").repartition(3)
      df.write.format("graft-sqldb")
        .option("dir", TestSpark.Sf0001)
        .option("table", "w_sink")
        .mode("append")
        .save()
      val got = remote("w_sink").orderBy("id")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)).orNull,
          r.getDouble(2), r.getBoolean(3))).toSeq
      assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L))
      assert(got(1)._2 == "quote's")
      assert(got(2)._2 == "back\\slash", "backslash must survive the dialect escape")
      assert(got(2)._3.isNaN)
      assert(got(3)._2 == null)
      // second append accumulates (no truncate semantics)
      Seq((5L, "more", 0.0, true)).toDF("id", "name", "score", "ok")
        .write.format("graft-sqldb")
        .option("dir", TestSpark.Sf0001).option("table", "w_sink")
        .mode("append").save()
      assert(remote("w_sink").count() == 5)
    } finally b.executeUpdate("DROP TABLE IF EXISTS w_sink")
  }

  test("unwritable column types are rejected at planning, not mid-job") {
    val b = backend
    b.executeUpdate("CREATE TABLE w_bad (id BIGINT)")
    try {
      val df = Seq((1L, Array(1, 2))).toDF("id", "arr")
      val e = intercept[Exception] {
        df.write.format("graft-sqldb")
          .option("dir", TestSpark.Sf0001).option("table", "w_bad")
          .mode("append").save()
      }
      // either our builder's message or Spark's schema check — both fail fast
      assert(e.getMessage != null)
      assert(remote("w_bad").count() == 0, "no partial rows may land")
    } finally b.executeUpdate("DROP TABLE IF EXISTS w_bad")
  }

  test("catalog CREATE TABLE + INSERT + SELECT round-trips through spark.sql") {
    spark.conf.set("spark.sql.catalog.graft_wdb", "graft.sources.GraftCatalog")
    spark.conf.set("graft.catalog.dir", TestSpark.Sf0001)
    try {
      spark.sql("CREATE TABLE graft_wdb.main.w_cat (k BIGINT, v STRING)")
      spark.sql("INSERT INTO graft_wdb.main.w_cat VALUES (1, 'a'), (2, 'b')")
      // write through the backend, read back through the catalog
      val got = spark.sql(
        "SELECT k, v FROM graft_wdb.main.w_cat ORDER BY k")
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((1L, "a"), (2L, "b")))
      // the catalog joins its own written table with a discovered one
      val joined = spark.sql(
        """SELECT w.v, n.n_name FROM graft_wdb.main.w_cat w
          |JOIN graft_wdb.main.nation n ON n.n_nationkey = w.k
          |ORDER BY w.k""".stripMargin).collect()
      assert(joined.length == 2)
      assert(spark.sql("DROP TABLE graft_wdb.main.w_cat").collect().isEmpty)
      assert(!spark.catalog.tableExists("graft_wdb.main.w_cat"))
    } finally {
      backend.executeUpdate("DROP TABLE IF EXISTS w_cat")
      spark.conf.unset("spark.sql.catalog.graft_wdb")
      spark.conf.unset("graft.catalog.dir")
    }
  }

  test("discovered backend tables are not droppable through the catalog") {
    spark.conf.set("spark.sql.catalog.graft_wdb2", "graft.sources.GraftCatalog")
    spark.conf.set("graft.catalog.dir", TestSpark.Sf0001)
    try {
      val e = intercept[Exception] {
        spark.sql("DROP TABLE graft_wdb2.main.nation")
      }
      assert(e != null)
      // still resolvable afterwards
      assert(spark.sql("SELECT COUNT(*) FROM graft_wdb2.main.nation")
        .collect()(0).getLong(0) == 25L)
    } finally {
      spark.conf.unset("spark.sql.catalog.graft_wdb2")
      spark.conf.unset("graft.catalog.dir")
    }
  }
}
