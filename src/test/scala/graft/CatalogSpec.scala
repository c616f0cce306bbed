package graft

import graft.plans.{GraftExtensions, PushedSqlQuery}
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 3-level catalog plugin: `graft_db.main.<table>` resolution through the
  * session catalog (reference `src/catalog.rs:8-103` + `load_catalog`). */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def install(): Unit = {
    spark.conf.set("spark.sql.catalog.graft_db", "graft.sources.GraftCatalog")
    spark.conf.set("graft.catalog.dir", TestSpark.Sf0001)
  }

  test("SHOW NAMESPACES and SHOW TABLES resolve through the plugin") {
    install()
    val ns = spark.sql("SHOW NAMESPACES IN graft_db").collect().map(_.getString(0))
    assert(ns.toSeq == Seq("main"))
    val tables = spark.sql("SHOW TABLES IN graft_db.main")
      .collect().map(_.getString(1)).sorted.toSeq
    assert(tables == Tables.names.sorted)
  }

  test("catalog-qualified query returns the same rows as a direct read") {
    install()
    val got = spark.sql(
      """SELECT n_name, r_name FROM graft_db.main.nation n
        |JOIN graft_db.main.region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name <> 'ASIA'""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
    val want = {
      val n = Tables.load(spark, TestSpark.Sf0001, "nation")
      val r = Tables.load(spark, TestSpark.Sf0001, "region")
      n.join(r, col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") =!= "ASIA")
        .select(col("n_name"), col("r_name"))
        .collect().map(_.toString).sorted.toSeq
    }
    assert(got == want)
  }

  test("catalog-resolved scans fuse into one pushed backend SQL") {
    install()
    GraftExtensions.install(spark)
    val df = spark.sql(
      """SELECT r_name, COUNT(*) AS n_nations
        |FROM graft_db.main.nation JOIN graft_db.main.region
        |  ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin)
    val pushed = df.queryExecution.optimizedPlan.collect {
      case p: PushedSqlQuery => p
    }
    assert(pushed.size == 1,
      "catalog scans did not fuse:\n" + df.queryExecution.optimizedPlan)
    assert(df.count() == 5)
  }

  test("loadTable serves the DSv2 table; DDL is rejected as read-only") {
    install()
    // force plugin instantiation through the session's catalog manager
    spark.sql("SHOW TABLES IN graft_db.main").collect()
    val cat = spark.sessionState.catalogManager.catalog("graft_db")
      .asInstanceOf[TableCatalog]
    val ident = Identifier.of(Array("main"), "customer")
    assert(cat.tableExists(ident))
    val t = cat.loadTable(ident)
    assert(t.schema().fieldNames.contains("c_custkey"))
    intercept[UnsupportedOperationException](cat.dropTable(ident))
    assert(!cat.tableExists(Identifier.of(Array("main"), "nope")))
  }
}
