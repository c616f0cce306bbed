package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 10× stress fixtures for the three 100×-behavior claims that were
  * previously proven only by reasoning: the heavy-hitter exact-regime
  * guard actually TRIPS past sketch capacity, the dedup driver/
  * distributed threshold crossover returns identical groups on both
  * sides, and sparse-key quantile slicing balances a snowflake-keyed
  * table an order of magnitude past the corpus tests. Fixtures are
  * builder-derived from sf0.1 (shifted-id self-unions — /root/testdata
  * itself is never written). */
class StressGuardsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val Sf01 = "/root/testdata/sf0.1"

  test("exact-regime guard trips when part cardinality exceeds sketch capacity") {
    // sf0.1 part = 20k keys; 10 shifted copies = 200k > the 65,536-slot
    // sketch — the approx_top_parts oracle entry must fail FAST and LOUD
    // (at sf1 this is exactly what a silent run would flake on)
    val dir = java.nio.file.Files.createTempDirectory("graft_stress_part").toString
    val part = Tables.load(spark, Sf01, "part")
    (0 until 10).map(i => part.withColumn("p_partkey",
        col("p_partkey") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
      .write.parquet(s"$dir/part.parquet")
    val ex = intercept[IllegalArgumentException] {
      SparkEntry.queries("approx_top_parts")(spark, dir)
    }
    assert(ex.getMessage.contains("exceed sketch capacity"),
      s"guard tripped with the wrong message: ${ex.getMessage}")
  }

  test("dedup group crossover: driver union-find == distributed propagation at 10x edges") {
    // 10× corpus: 9 shifted copies of every sf0.1 doc id; edges form
    // 5,000 star components of size 10 (45k edges) plus one 64-hop chain
    // — deep enough that plain one-hop propagation would need 63 rounds
    // and the pointer jump's O(log d) bound is actually load-bearing
    import spark.implicits._
    val base = Tables.load(spark, Sf01, "documents").select("doc_id")
    val docs = (0 until 10).map(i =>
        base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id")))
      .reduce(_ unionByName _)
      .unionByName((0L to 63L).map(k => 500000000L + k).toDF("doc_id"))
    val starEdges = (1 until 10).map(i =>
        base.select(col("doc_id").as("doc_a"),
          (col("doc_id") + lit(i * 10000000L)).as("doc_b")))
      .reduce(_ unionByName _)
    val chainEdges = (0L until 63L)
      .map(k => (500000000L + k, 500000000L + k + 1)).toDF("doc_a", "doc_b")
    val pairs = starEdges.unionByName(chainEdges)

    def run(threshold: Long) = graft.ops.Dedup
      .dedupGroups(docs, pairs, collectThreshold = threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val viaDriver = run(Long.MaxValue) // everything under the threshold
    val viaCluster = run(0L)           // everything over it
    assert(viaDriver == viaCluster,
      "driver union-find and distributed propagation disagree at 10x")
    // spot the semantics too: every star member labels to its base id,
    // the whole chain labels to its head
    val labels = viaDriver.toMap
    assert(labels(500000063L) == 500000000L, "64-hop chain did not converge")
    val someBase = labels.keySet.filter(_ < 10000000L).take(100)
    assert(someBase.forall(id => labels(id + 90000000L) == labels(id)),
      "star component split across the crossover")
  }

  test("sparse snowflake keys split balanced by probed quantiles at 10k rows") {
    System.setProperty("derby.system.home", "/tmp/derby")
    val url = "jdbc:derby:memory:graftstress;create=true"
    val c = DriverManager.getConnection(url)
    c.createStatement().executeUpdate(
      """CREATE TABLE "snow" ("id" BIGINT NOT NULL PRIMARY KEY, "v" INTEGER)""")
    c.close()
    val backend = graft.sources.JdbcBackend.forUrl("jdbc:derby:memory:graftstress")
    try {
      // 5k dense ids + 5k snowflake ids 7 orders of magnitude away: a
      // value stride piles everything into two edge slices; probed
      // quantiles must spread 10k rows near-evenly
      val ids = (1L to 5000L) ++ (1L to 5000L).map(i => 1000000000000L + i * 10000000L)
      ids.grouped(500).foreach { g =>
        backend.executeUpdate(s"""INSERT INTO "snow" VALUES ${
          g.map(i => s"($i, ${(i % 97).toInt})").mkString(", ")}""")
      }
      val df = spark.read.format("graft-sqldb")
        .option("url", "jdbc:derby:memory:graftstress")
        .option("table", "snow").load()
      val scan = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[graft.sources.GraftScan] =>
          b.scan.asInstanceOf[graft.sources.GraftScan]
      }.head
      val parts = scan.planInputPartitions()
        .map(_.asInstanceOf[graft.sources.GraftInputPartition])
      assert(parts.length > 1, "10k sparse keys did not split")
      val perPart = parts.map(p => backend.executeSql(p.sql).length)
      assert(perPart.sum == 10000,
        s"partition union lost/duplicated rows: ${perPart.toSeq}")
      val mean = perPart.sum.toDouble / perPart.length
      assert(perPart.max <= 2 * mean,
        s"quantile split left a skewed partition (mean $mean): ${perPart.toSeq}")
      assert(df.count() == 10000)
    } finally backend.executeUpdate("""DROP TABLE "snow"""")
  }
}
