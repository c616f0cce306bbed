package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines — the op every
  * corpus build needs between dedup and training: stable train/val/test
  * assignment that (a) never changes when the pipeline reruns, (b) never
  * depends on row order or partitioning, and (c) is reproducible by any
  * other engine reading the same ids.
  *
  * The assignment is a Knuth multiplicative hash over the id, kept inside
  * plain integer SQL arithmetic ON PURPOSE: no engine-specific hash
  * function, so the DuckDB oracle (and any downstream system) reproduces
  * the exact split from the id alone. The id is reduced mod a prime first
  * so the multiply stays far from Long overflow at any realistic id width
  * (id % 1000003 < 2^20; × 2654435761 < 2^52).
  *
  * Scale: one map-only projection — no shuffle, no state; split
  * proportions hold per partition by the hash's uniformity, so sampling a
  * 100 TB corpus is exactly a full scan.
  */
object Sampling {

  /** Per-mille bucket for an id column (0–999), stable across engines. */
  def splitBucket(idCol: String): org.apache.spark.sql.Column =
    pmod((col(idCol) % 1000003L) * 2654435761L, lit(1000L))

  /** Assign train/val/test by per-mille thresholds (default 80/10/10). */
  def deterministicSplit(df: DataFrame, idCol: String = "doc_id",
      trainPerMille: Int = 800, valPerMille: Int = 100): DataFrame = {
    require(trainPerMille + valPerMille <= 1000, "split fractions exceed 1")
    val b = splitBucket(idCol)
    df.withColumn("split",
      when(b < trainPerMille, "train")
        .when(b < trainPerMille + valPerMille, "val")
        .otherwise("test"))
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "sample_split" -> ((s, d) =>
      deterministicSplit(Tables.load(s, d, "documents"))
        .select("doc_id", "split")
        .orderBy("doc_id")),
  )

  val oracle: Seq[(String, String)] = Seq(
    "sample_split" ->
      """SELECT doc_id,
        |       CASE WHEN b < 800 THEN 'train'
        |            WHEN b < 900 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM (SELECT doc_id, ((doc_id % 1000003) * 2654435761) % 1000 AS b
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,
  )
}
