package graft

import graft.ops.Similarity
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape guards for the scale-sensitive similarity ops: the
  * properties that make them survive a 100× corpus are structural (what the
  * exchanges carry, where aggregation collapses the data), so they are
  * asserted on the executed plan, not just on results. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")

  /** Run the query and return every node of the FINAL adaptive plan.
    * TreeNode.collect stops at AdaptiveSparkPlanExec / QueryStageExec
    * boundaries (their inner plans are fields, not children), so unwrap
    * them explicitly. */
  private def allNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case _ => p.children.flatMap(flatten)
    })
    flatten(df.queryExecution.executedPlan)
  }

  test("ivfTopK assigns centroids by aggregate, not a window over the expansion") {
    val nodes = allNodes(Similarity.ivfTopK(emb))
    val planStr = nodes.head.toString
    // the corpus×centroids expansion must collapse in a partial aggregate
    // (map-side combine) BEFORE any exchange; a window-based top-spill
    // would shuffle the full expansion first. r13: the assignment is the
    // bounded TopK aggregate (spilled assignment), not max_by
    assert(planStr.contains("topk") || planStr.contains("TopK"),
      s"expected bounded TopK assignment aggregate:\n$planStr")
    assert(!planStr.contains("windowspecdefinition(vec_id"),
      s"window over the corpus side found (shuffles corpus×centroids):\n$planStr")
    // windows are allowed only on the broadcast-small probe side (qid)
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.forall(_.partitionSpec.forall(_.references.toSeq
        .forall(_.name == "qid"))),
      s"window partitioned on a non-probe column:\n$planStr")
  }

  test("lshTopK moves ids only through bucket join and candidate dedup") {
    val nodes = allNodes(Similarity.lshTopK(emb))
    val plan = nodes.head
    // Candidate traffic (anything keyed by bucket, or by the (qid, vec_id)
    // pair) must not carry a vector payload across ANY exchange — shuffle
    // or broadcast (at small scale AQE turns the bucket join into a
    // broadcast; the invariant is about what the wire carries, not which
    // join strategy won). Vectors cross an exchange only for the
    // post-dedup join-backs, which are keyed by a single id and carry no
    // bucket column.
    val exchanges = nodes.collect {
      case e: ShuffleExchangeExec => e
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
    }
    val candidateExchanges = exchanges.filter { e =>
      val names = e.output.map(_.name)
      names.contains("bucket") ||
        (names.contains("qid") && names.contains("vec_id"))
    }
    assert(candidateExchanges.nonEmpty, s"no candidate exchanges found:\n$plan")
    candidateExchanges.foreach { e =>
      val names = e.output.map(_.name)
      assert(!names.contains("embedding") && !names.exists(_.startsWith("qvec")),
        s"candidate exchange carries vector payload ${names.mkString(",")}:\n$plan")
    }
    // the dedup aggregate itself groups bare ids (no payload columns)
    val planStr = plan.toString
    assert(planStr.contains("HashAggregate(keys=[qid"), planStr.take(2000))
    val dedupLine = planStr.linesIterator
      .find(l => l.contains("HashAggregate(keys=[qid") && l.contains("vec_id")).get
    assert(!dedupLine.contains("embedding") && !dedupLine.contains("qvec"), dedupLine)
  }

  test("ivfQuantizedTopK keeps the aggregate assignment and never shuffles float vectors") {
    val nodes = allNodes(Similarity.ivfQuantizedTopK(emb))
    val planStr = nodes.head.toString
    // same structural property as ivfTopK: the corpus×centroids expansion
    // collapses in a partial bounded-TopK (spilled-assignment) aggregate
    // before any exchange
    assert(planStr.contains("topk") || planStr.contains("TopK"),
      s"expected bounded TopK assignment aggregate:\n$planStr")
    assert(!planStr.contains("windowspecdefinition(vec_id"),
      s"window over the corpus side found:\n$planStr")
    // the whole pipeline runs on int8: no exchange may carry the original
    // float32 `embedding` column — the 4× narrower qvec is the payload
    val exchanges = nodes.collect {
      case e: ShuffleExchangeExec => e
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
    }
    exchanges.foreach { e =>
      val names = e.output.map(_.name)
      assert(!names.contains("embedding"),
        s"exchange carries float32 embedding ${names.mkString(",")}")
    }
  }
}
