package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering: correctness (pure reorganization) and the pruning
  * claim itself — file-level min/max ranges must let a predicate on ANY
  * z column skip most files, where a linear sort clusters only its
  * leading column. Asserted from the written files' actual footer-backed
  * ranges, not from plan text. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val nFiles = 8
  private lazy val zPath = Layout.ensureZOrdered(
    spark, TestSpark.Sf0001, "lineitem", Seq("l_orderkey", "l_partkey"), nFiles)
  private lazy val linearPath: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_linear").toString
    Tables.load(spark, TestSpark.Sf0001, "lineitem")
      .repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(p)
    p
  }

  private def candidates(path: String, c: String, lo: Double, hi: Double): Int =
    Layout.fileRanges(spark, path, c).count { case (_, mn, mx) =>
      mx >= lo && mn <= hi }

  test("z-ordered copy holds exactly the base rows") {
    val base = Tables.load(spark, TestSpark.Sf0001, "lineitem")
      .collect().map(_.toString).sorted.toSeq
    val z = spark.read.parquet(zPath).collect().map(_.toString).sorted.toSeq
    assert(z == base)
    assert(spark.read.parquet(zPath).schema ==
      Tables.load(spark, TestSpark.Sf0001, "lineitem").schema)
  }

  test("both z columns prune files; linear sort prunes only its leader") {
    val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
    val Seq(okMax, pkMax) = li
      .agg(max("l_orderkey").cast("double"), max("l_partkey").cast("double"))
      .head().toSeq.map(_.asInstanceOf[Double]).toSeq
    // a ~1/4-span band on each dimension
    val (okLo, okHi) = (okMax * 0.25, okMax * 0.5)
    val (pkLo, pkHi) = (pkMax * 0.25, pkMax * 0.5)

    // leading-column band: both layouts prune
    assert(candidates(zPath, "l_orderkey", okLo, okHi) < nFiles)
    assert(candidates(linearPath, "l_orderkey", okLo, okHi) < nFiles)

    // NON-leading column band: the linear layout cannot prune at all —
    // every file spans ~the full partkey range — while z-order must skip
    // at least some files
    val zPk = candidates(zPath, "l_partkey", pkLo, pkHi)
    val linPk = candidates(linearPath, "l_partkey", pkLo, pkHi)
    assert(linPk == nFiles,
      s"linear layout unexpectedly clustered partkey: $linPk/$nFiles")
    assert(zPk < linPk, s"z-order pruned nothing on partkey: $zPk/$nFiles")
  }

  test("runtime scan skips row groups via pushed min/max predicates") {
    val df = spark.read.parquet(zPath)
      .filter(col("l_partkey") <= 50)
    val n = df.count()
    val total = spark.read.parquet(zPath).count()
    assert(n > 0 && n < total)
    // the scan's output row count reflects row-group pruning: surviving
    // groups only, which must be a strict subset of the table
    val scanRows = df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
    assert(scanRows < total,
      s"scan read every row ($scanRows of $total) — no row-group skipping")
  }

  test("z-ordered append adds self-clustered files without touching history") {
    val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val path = java.nio.file.Files.createTempDirectory("graft_zappend").toString
    val history = li.filter(col("l_orderkey") % 5 =!= 0)
    val batch = li.filter(col("l_orderkey") % 5 === 0)
    Layout.writeZOrdered(history, path, Seq("l_orderkey", "l_partkey"))
    val before = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified).toMap
    Layout.appendZOrdered(batch, path, Seq("l_orderkey", "l_partkey"))
    // history untouched: O(|batch|), never a rewrite
    val after = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified).toMap
    assert(before.forall { case (n, m) => after.get(n).contains(m) },
      "append rewrote history files")
    assert(after.size > before.size, "append added no files")
    // content exact: union of history and batch, nothing lost or doubled
    val got = spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    val want = li.collect().map(_.toString).sorted.toSeq
    assert(got == want)
    // the appended files are hypercubes of the BATCH: both z columns'
    // per-file ranges must be narrower than the batch's full span for at
    // least the majority of new files (self-clustering, not random)
    val newFiles = after.keySet -- before.keySet
    // a 2-file Morton range split halves on whichever column owns the
    // leading interleaved bit — assert SOME z column's per-file ranges
    // narrowed (that is what footer pruning consumes)
    val narrowed = Seq("l_orderkey", "l_partkey").exists { c =>
      val ranges = Layout.fileRanges(spark, path, c)
        .filter { case (f, _, _) => newFiles.exists(f.contains) }
      assert(ranges.size > 1, "append produced a single file — nothing to prune")
      val spans = ranges.map { case (_, mn, mx) => mx - mn }
      val full = batch.agg((max(col(c)) - min(col(c))).cast("double"))
        .head.getDouble(0)
      spans.max < full * 0.75
    }
    assert(narrowed, "no z column's per-file ranges narrowed — appended files are not clustered")
  }

  test("compaction bin-packs small files to the target size, rows intact") {
    val small = java.nio.file.Files.createTempDirectory("graft_small").toString
    val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
    li.repartition(40).write.mode("overwrite").parquet(small) // 40 shards
    val bytes = new java.io.File(small).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val dst = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val n = Layout.compact(spark, small, dst, targetBytes = bytes / 4 + 1)
    assert(n == 4)
    val files = new java.io.File(dst).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 4, s"expected 4 output files, got $files")
    assert(spark.read.parquet(dst).collect().map(_.toString).sorted.toSeq ==
      li.collect().map(_.toString).sorted.toSeq)
  }

  test("bucketed co-located join: zero shuffle exchanges under the join, same result") {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val lt = Layout.ensureBucketed(s, TestSpark.Sf0001, "lineitem", Seq("l_orderkey"))
    val ot = Layout.ensureBucketed(s, TestSpark.Sf0001, "orders", Seq("o_orderkey"))
    def q(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
        .orderBy("o_orderpriority")
    // count exchanges in AQE's FINAL plan only (its toString repeats the
    // initial plan below a marker line)
    def shuffles(df: org.apache.spark.sql.DataFrame): (Int, String, Seq[String]) = {
      val rows = df.collect().map(_.toString).toSeq // finalize AQE's plan
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      ("Exchange".r.findAllIn(plan).length, plan, rows)
    }
    val (bktEx, bktPlan, bktRows) = shuffles(q(s.table(lt), s.table(ot)))
    val (plainEx, _, plainRows) = shuffles(q(
      Tables.load(s, TestSpark.Sf0001, "lineitem"),
      Tables.load(s, TestSpark.Sf0001, "orders")))
    assert(bktRows == plainRows, "bucketed join changed the result")
    // the bucketed scans feed the SortMergeJoin directly: the only
    // exchanges left are the aggregate's and the orderBy's — the plain
    // plan carries two more, one per join input
    assert(bktPlan.contains("Bucketed: true"), bktPlan)
    assert(bktEx == 2, s"bucketed plan has $bktEx exchanges, want 2:\n$bktPlan")
    assert(plainEx == bktEx + 2,
      s"plain plan has $plainEx exchanges, expected ${bktEx + 2}")
    // the catalog-less registration path: newSession() SHARES the
    // external catalog (SharedState), so a "fresh session" still sees the
    // table — to drive the external-DDL branch a fresh JVM takes, DROP
    // the catalog entries (external tables: metadata only, files stay)
    // and re-ensure
    val s2 = TestSpark.spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val before = new java.io.File(new java.io.File(
      sys.props("java.io.tmpdir"), "graft-bkt"), lt)
      .listFiles().map(f => f.getName -> f.lastModified).toMap
    s2.sql(s"DROP TABLE $lt")
    s2.sql(s"DROP TABLE $ot")
    assert(!s2.catalog.tableExists(lt), "DROP left the catalog entry")
    val lt2 = Layout.ensureBucketed(s2, TestSpark.Sf0001, "lineitem", Seq("l_orderkey"))
    assert(lt2 == lt)
    val after = new java.io.File(new java.io.File(
      sys.props("java.io.tmpdir"), "graft-bkt"), lt)
      .listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(before == after, "re-registration rewrote the bucket files")
    val ot2 = Layout.ensureBucketed(s2, TestSpark.Sf0001, "orders", Seq("o_orderkey"))
    val (bktEx2, _, bktRows2) = shuffles(q(s2.table(lt2), s2.table(ot2)))
    assert(bktEx2 == 2 && bktRows2 == plainRows,
      s"DDL-re-registered bucket tables lost the zero-shuffle join: $bktEx2")
  }

  test("oracle entry zorder_scan equals the same query on the base table") {
    val (name, fn) = Layout.entries.head
    assert(name == "zorder_scan")
    val got = fn(spark, TestSpark.Sf0001).collect().map(_.toString).toSeq
    val want = Tables.load(spark, TestSpark.Sf0001, "lineitem")
      .filter(col("l_orderkey").between(1000, 3000) &&
        col("l_partkey").between(100, 1000))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag")
      .collect().map(_.toString).toSeq
    assert(got == want)
  }
}
