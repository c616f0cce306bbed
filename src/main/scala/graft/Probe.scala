package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch harness (r19/r20 optimization rounds): time named
  * sub-pipelines through the noop sink — guide §1.4 methodology — to
  * attribute an entry's cost to its stages. Edit the `stages` map per
  * experiment; not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.ops._

    // --- profile_quantiles decomposition (r20) --------------------------
    val qCols = Seq("l_quantity", "l_extendedprice", "l_discount")
    def lineitem = Tables.load(spark, sfDir, "lineitem")
    // current: one scan, 3x explode with STRING column keys
    def qCountsExplode: DataFrame = {
      val recs = array(qCols.map(c =>
        struct(lit(c).as("column_name"), col(c).cast("double").as("value"))): _*)
      lineitem.select(explode(recs).as("r"))
        .select(col("r.column_name").as("column_name"), col("r.value").as("value"))
        .filter(col("value").isNotNull)
        .groupBy("column_name", "value")
        .agg(count(lit(1)).as("cnt"))
    }
    // candidate A: same explode, INT gid keys (narrower shuffle + cheaper
    // hash than the string key)
    def qCountsGid: DataFrame = {
      val recs = array(qCols.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("gid"), col(c).cast("double").as("value")) }: _*)
      lineitem.select(explode(recs).as("r"))
        .select(col("r.gid").as("gid"), col("r.value").as("value"))
        .filter(col("value").isNotNull)
        .groupBy("gid", "value")
        .agg(count(lit(1)).as("cnt"))
    }
    // candidate B: per-column single-key aggregates, name attached after
    def qCountsUnion: DataFrame =
      qCols.map { c =>
        lineitem.select(col(c).cast("double").as("value"))
          .filter(col("value").isNotNull)
          .groupBy("value").agg(count(lit(1)).as("cnt"))
          .select(lit(c).as("column_name"), col("value"), col("cnt"))
      }.reduce(_ union _)

    // --- crawl composition decomposition (r20) ---------------------------
    def warcValid: DataFrame = {
      val (valid, _) = graft.sources.WarcIngest.readWithQuarantine(
        spark, graft.sources.WarcIngest.ensureWarcDrop(spark, sfDir))
      valid
    }
    def crawlExtracted: DataFrame = warcValid
      .select(col("doc_id"), col("lang"),
        expr(TextAnalysis.htmlPageTemplateExpr).as("html"))
      .select(col("doc_id"), col("lang"),
        graft.functions.GraftFunctions.html_to_text(col("html")).as("text"))

    val stages: Seq[(String, () => DataFrame)] = Seq(
      "q_full" -> (() => SparkEntry.queries("profile_quantiles")(spark, sfDir)),
      "q_counts_explode" -> (() => qCountsExplode),
      "q_counts_gid" -> (() => qCountsGid),
      "q_counts_union" -> (() => qCountsUnion),
      "crawl_valid" -> (() => warcValid),
      "crawl_extracted" -> (() => crawlExtracted),
      "crawl_full" -> (() => SparkEntry.queries("e2e_crawl_to_chunks")(spark, sfDir))
    )
    // warmup
    stages.foreach { case (_, f) => f().write.format("noop").mode("overwrite").save() }
    spark.sharedState.cacheManager.clearCache()
    (1 to 2).foreach { pass =>
      stages.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        println(f"[probe] pass$pass $name%-28s $dt%8.3f s")
      }
    }
    spark.stop()
  }
}
