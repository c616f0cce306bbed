package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the ngram-Jaccard pipeline stages (not a test;
  * run with Test/runMain graft.ProfileNgram [sfDir]). */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warmup
    Tables.load(spark, dir, "documents").count()

    val docs = Dedup.withPlantedNearDups(Tables.load(spark, dir, "documents"))
    val exploded = Dedup.shingleHashes(docs)
      .select(col("doc_id"), explode(array_distinct(col("shingles"))).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("materialize exploded")(println("  rows=" + exploded.count()))
    val hot = exploded.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > 1000).select("sh")
    t("hot cutoff")(println("  hot=" + hot.count()))
    val rare = exploded.join(broadcast(hot), Seq("sh"), "left_anti")
    val sizes = rare.groupBy("doc_id").agg(count(lit(1)).as("set_size"))
    t("sizes")(println("  docs=" + sizes.count()))
    val common = rare.select(col("doc_id").as("doc_a"), col("sh"))
      .join(rare.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_common"))
    t("self-join + pair agg")(println("  pairs=" + common.count()))
    val out = common
      .join(sizes.select(col("doc_id").as("doc_a"), col("set_size").as("size_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("set_size").as("size_b")), Seq("doc_b"))
      .withColumn("jaccard", col("n_common") / (col("size_a") + col("size_b") - col("n_common")))
      .filter(col("jaccard") >= 0.5)
    t("final join + filter")(println("  out=" + out.count()))
    t("full pipeline rerun")(
      println("  out=" + Dedup.ngramJaccardPairs(docs).write.format("noop").mode("overwrite").save()))
    spark.stop()
  }
}
