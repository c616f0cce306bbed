package graft

import java.sql.DriverManager

import graft.sources.{JdbcBackend, SqlWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Key-matched upsert (MERGE) against a REAL SQL engine: embedded Derby
  * parses ANSI MERGE (10.11+), so the rendered statement, the staged
  * landing, the single-transaction publish, and the conflict semantics
  * all run live here — the same tier of proof DerbyFusionSpec gives the
  * read-side fusion. The in-process double's emulated path is covered by
  * the oracle entry `s37_upsert`. */
class MergeUpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Url = {
    System.setProperty("derby.system.home", "/tmp/derby")
    val url = "jdbc:derby:memory:graftmerge"
    DriverManager.getConnection(url + ";create=true").close()
    url
  }
  private def backend = JdbcBackend.forUrl(Url)
  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(Url)
    try { val st = c.createStatement(); try st.executeUpdate(sql) finally st.close() }
    finally c.close()
  }
  private def remote(table: String) =
    spark.read.format("graft-sqldb").option("url", Url).option("table", table).load()

  test("renderMerge: ANSI shape, key-only degeneration, drift rejection") {
    val d = graft.sources.DerbyDialect
    val sql = SqlWrite.renderMerge("tgt", "stg", Seq("id"), Seq("id", "v", "w"), d)
    assert(sql ===
      """MERGE INTO "tgt" t USING "stg" s ON t."id" = s."id"""" +
        """ WHEN MATCHED THEN UPDATE SET "v" = s."v", "w" = s."w"""" +
        """ WHEN NOT MATCHED THEN INSERT ("id", "v", "w") VALUES (s."id", s."v", s."w")""")
    // composite key: every key in the ON conjunction, none in the SET list
    val comp = SqlWrite.renderMerge("t2", "s2", Seq("a", "b"), Seq("a", "b", "x"), d)
    assert(comp.contains("""t."a" = s."a" AND t."b" = s."b""""))
    assert(comp.contains("""UPDATE SET "x" = s."x""""))
    // all columns are keys → insert-if-absent, no empty SET clause
    val keyOnly = SqlWrite.renderMerge("t3", "s3", Seq("k"), Seq("k"), d)
    assert(!keyOnly.contains("WHEN MATCHED"))
    assert(keyOnly.contains("WHEN NOT MATCHED THEN INSERT"))
    // a key the written columns don't carry is a planning error
    val ex = intercept[IllegalArgumentException] {
      SqlWrite.renderMerge("t4", "s4", Seq("nope"), Seq("id", "v"), d)
    }
    assert(ex.getMessage.contains("nope"))
  }

  test("DSv2 upsert against live Derby: update in place, insert new, keep untouched") {
    exec("""CREATE TABLE "m_acct" ("id" BIGINT NOT NULL PRIMARY KEY,
           | "name" VARCHAR(32), "bal" DOUBLE)""".stripMargin)
    try {
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("id", "name", "bal")
        .write.format("graft-sqldb").option("url", Url).option("table", "m_acct")
        .mode("append").save()
      // upsert: 2 and 3 re-stated, 4 and 5 new — across partitions
      Seq((2L, "b2", 22.0), (3L, "c2", 33.0), (4L, "d", 40.0), (5L, "e", 50.0))
        .toDF("id", "name", "bal").repartition(3)
        .write.format("graft-sqldb").option("url", Url).option("table", "m_acct")
        .option("upsertKeys", "id")
        .mode("append").save()
      val got = remote("m_acct").orderBy("id")
        .as[(Long, String, Double)].collect().toSeq
      assert(got === Seq((1L, "a", 10.0), (2L, "b2", 22.0), (3L, "c2", 33.0),
        (4L, "d", 40.0), (5L, "e", 50.0)))
      // upsert is idempotent by key: re-stating the same rows changes nothing
      Seq((2L, "b2", 22.0), (4L, "d", 40.0)).toDF("id", "name", "bal")
        .write.format("graft-sqldb").option("url", Url).option("table", "m_acct")
        .option("upsertKeys", "id").mode("append").save()
      assert(remote("m_acct").count() === 5)
      // no staging leftovers after the commits
      val md = DriverManager.getConnection(Url)
      try {
        val rs = md.getMetaData.getTables(null, null, "m_acct__%", null)
        assert(!rs.next(), "staging tables must be dropped after publish")
      } finally md.close()
    } finally exec("""DROP TABLE "m_acct"""")
  }

  test("upsert is FULL-ROW replace: Spark null-fills unwritten columns before the sink") {
    // DSv2 output resolution (TableOutputResolver) pads missing nullable
    // columns with NULL literals BEFORE the write reaches the builder, so
    // a "column subset" DataFrame arrives as the full table schema — the
    // MERGE then re-states every column of a matched row, NULLing the
    // unwritten ones. That is the DataFrameWriter-surface contract (a
    // partial-column upsert is inexpressible there); callers who need
    // column-subset MERGE use SqlWrite.renderMerge directly, as
    // ExactlyOnceSink.publish does with the discovered full schema.
    exec("""CREATE TABLE "m_sub" ("id" BIGINT NOT NULL PRIMARY KEY,
           | "v" VARCHAR(16), "keepme" INTEGER)""".stripMargin)
    try {
      exec("""INSERT INTO "m_sub" VALUES (1, 'old', 7), (2, 'two', 8)""")
      Seq((1L, "new"), (9L, "nine")).toDF("id", "v")
        .write.format("graft-sqldb").option("url", Url).option("table", "m_sub")
        .option("upsertKeys", "id").mode("append").save()
      val got = remote("m_sub").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)).orNull)).toSeq
      // matched row 1: full-row restatement (keepme → NULL); untouched row
      // 2 keeps its value; inserted row 9 has no keepme
      assert(got === Seq((1L, "new", null), (2L, "two", 8), (9L, "nine", null)))
    } finally exec("""DROP TABLE "m_sub"""")
  }

  test("conflict path: key-duplicate source fails whole and leaves the target untouched") {
    exec("""CREATE TABLE "m_dup" ("id" BIGINT NOT NULL PRIMARY KEY, "v" DOUBLE)""")
    try {
      exec("""INSERT INTO "m_dup" VALUES (1, 1.0)""")
      // two source rows for key 1: the SQL standard's MERGE cardinality
      // violation — the single-transaction publish must roll back whole
      val ex = intercept[Exception] {
        Seq((1L, 2.0), (1L, 3.0)).toDF("id", "v")
          .write.format("graft-sqldb").option("url", Url).option("table", "m_dup")
          .option("upsertKeys", "id").mode("append").save()
      }
      assert(ex != null)
      val got = remote("m_dup").as[(Long, Double)].collect().toSeq
      assert(got === Seq((1L, 1.0)), "failed MERGE must not partially apply")
    } finally exec("""DROP TABLE "m_dup"""")
  }

  test("upsert key missing from the written columns fails at planning") {
    exec("""CREATE TABLE "m_plan" ("id" BIGINT, "v" DOUBLE)""")
    try {
      val ex = intercept[Exception] {
        Seq((1L, 2.0)).toDF("id", "v")
          .write.format("graft-sqldb").option("url", Url).option("table", "m_plan")
          .option("upsertKeys", "nope").mode("append").save()
      }
      assert(ex.getMessage != null)
      assert(remote("m_plan").count() === 0)
    } finally exec("""DROP TABLE "m_plan"""")
  }

  test("ExactlyOnceSink.upsert: replay-safe by batch id AND idempotent by key") {
    import graft.streaming.ExactlyOnceSink
    exec("""CREATE TABLE "eo_dim" ("id" BIGINT NOT NULL PRIMARY KEY, "v" VARCHAR(16))""")
    try {
      val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      ExactlyOnceSink.upsert(Url, "eo_dim", Seq("id"))(b0, 0L)
      assert(remote("eo_dim").orderBy("id").as[(Long, String)].collect().toSeq ===
        Seq((1L, "a"), (2L, "b")))
      // replay of the SAME batch id (restart recovery) must be a no-op —
      // even with different content, the marker wins
      ExactlyOnceSink.upsert(Url, "eo_dim", Seq("id"))(
        Seq((1L, "ZOMBIE")).toDF("id", "v"), 0L)
      assert(remote("eo_dim").orderBy("id").as[(Long, String)].collect().toSeq ===
        Seq((1L, "a"), (2L, "b")))
      // the next batch id re-states key 2 and adds key 3: update + insert,
      // no duplicate key 2 (the append sink would have doubled it)
      ExactlyOnceSink.upsert(Url, "eo_dim", Seq("id"))(
        Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), 1L)
      assert(remote("eo_dim").orderBy("id").as[(Long, String)].collect().toSeq ===
        Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    } finally {
      exec("""DROP TABLE "eo_dim"""")
      try exec("""DROP TABLE "eo_dim__staging"""") catch { case _: Exception => }
      try exec("""DROP TABLE "eo_dim__batches"""") catch { case _: Exception => }
    }
  }
}
