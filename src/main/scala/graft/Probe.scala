package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch harness (r19 optimization round): time named sub-pipelines
  * through the noop sink — guide §1.4 methodology — to attribute an
  * entry's cost to its stages. Edit the `stages` map per experiment; not
  * part of the driver contract. */
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

    import graft.functions.GraftFunctions._
    import graft.ops._
    def docsC = Curation.withPlantedDups(Tables.load(spark, sfDir, "documents"))
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in",
      "is", "it", "that", "for", "on", "with", "as", "at", "by", "be")
    def statsSel(d: DataFrame) = d.select(col("doc_id"),
      text_stats(col("text"), stop).as("st"))
      .select(col("doc_id"), col("st.n_chars"), col("st.n_toks"),
        col("st.n_stop"), col("st.n_punct"), col("st.n_alpha"))
    val stages: Seq[(String, () => DataFrame)] = Seq(
      "1_full_ngram" -> (() => Dedup.ngramJaccardPairs(
        Dedup.withPlantedNearDups(Tables.load(spark, sfDir, "documents")))),
      "2_groups_dist" -> (() => SparkEntry.queries("dedup_groups_dist")(spark, sfDir)),
      "3_quantiles" -> (() => SparkEntry.queries("profile_quantiles")(spark, sfDir)),
      "4_semantic" -> (() => SparkEntry.queries("dedup_semantic")(spark, sfDir)),
      "5_kmeans" -> (() => SparkEntry.queries("sim_topk_ivf_kmeans")(spark, sfDir)),
      "6_span_strip" -> (() => SparkEntry.queries("dedup_span_strip")(spark, sfDir)),
      "7_crawl" -> (() => SparkEntry.queries("e2e_crawl_to_chunks")(spark, sfDir))
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
