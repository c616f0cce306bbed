package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the ngram-Jaccard PPJoin pipeline stages (not a
  * test; run with Test/runMain graft.ProfileNgram [sfDir]). Mirrors the
  * CURRENT Dedup.ngramJaccardPairs shape — prefix-filtered candidates +
  * array_intersect verification — so stage timings point at the real
  * bottleneck, not a superseded plan. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val threshold = 0.5
    val maxDf = 1000
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
    val dfs = exploded.groupBy("sh").agg(count(lit(1)).as("df"))
    val hot = dfs.filter(col("df") > maxDf).select("sh")
    t("hot cutoff")(println("  hot=" + hot.count()))
    val rare = exploded.join(broadcast(hot), Seq("sh"), "left_anti")
    val sets = rare.join(dfs, Seq("sh"))
      .groupBy("doc_id")
      .agg(expr("transform(sort_array(collect_list(struct(df, sh))), r -> r.sh)").as("set"))
      .withColumn("set_size", size(col("set")).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("rarest-first sets")(println("  docs=" + sets.count()))
    val tS = math.floor(threshold * 1000000).toLong
    val prefix = sets.select(col("doc_id"), col("set_size"),
      posexplode(slice(col("set"), lit(1),
        expr(s"cast(set_size - ((set_size * $tS + 999999) div 1000000) + 1 as int)")))
        .as(Seq("pos", "sh")))
    t("prefix postings")(println("  rows=" + prefix.count()))
    val cand = prefix.select(col("doc_id").as("doc_a"), col("sh"),
        col("set_size").as("size_a"), col("pos").as("pos_a"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("sh"),
        col("set_size").as("size_b"), col("pos").as("pos_b")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b") &&
        greatest(col("size_a"), col("size_b")) * tS <=
          least(col("size_a"), col("size_b")) * 1000000L &&
        (lit(1) + least(col("size_a") - col("pos_a") - 1,
          col("size_b") - col("pos_b") - 1)) * (1000000L + tS) >=
          lit(tS) * (col("size_a") + col("size_b")))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
    t("prefix join + positional + dedup")(println("  cand=" + cand.count()))
    val verified = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("set").as("set_a"),
        col("set_size").as("size_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("set").as("set_b"),
        col("set_size").as("size_b")), Seq("doc_b"))
      .withColumn("n_common", size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .withColumn("jaccard", col("n_common") / (col("size_a") + col("size_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
    t("verify (array_intersect)")(println("  out=" + verified.count()))
    t("full pipeline rerun")(
      println("  out=" + Dedup.ngramJaccardPairs(docs).write.format("noop").mode("overwrite").save()))
    spark.stop()
  }
}
