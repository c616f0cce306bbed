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
    def gated = TextAnalysis.qualityScores(
      docsC.select(col("doc_id"), col("text"), col("lang")), keep = Seq("lang", "text"))
      .filter(col("n_tokens").between(20, 2000) && col("quality_score") >= 0.5)
      .select(col("doc_id"), col("lang"), col("text"), col("n_tokens"), col("quality_score"))
    def kept = gated
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("text"),
        col("n_tokens"), col("quality_score")), col("doc_id")).as("r"),
        count(lit(1)).as("n_copies"))
      .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
        col("r.text").as("text"), col("r.n_tokens").as("n_tokens"),
        col("r.quality_score").as("quality_score"), col("n_copies"))
    val stages: Seq[(String, () => DataFrame)] = Seq(
      "1_planted" -> (() => docsC),
      "2_gated" -> (() => gated),
      "3_kept" -> (() => kept),
      "4_minhash_pairs" -> (() => Dedup.minHashPairs(kept, 16, 0.5)),
      "5_curate_full" -> (() => Curation.curate(docsC)),
      "6_curate_chunks" -> (() => Curation.curateToChunks(docsC))
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
