package graft

import graft.plans.{GraftExtensions, PushedSqlQuery}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Production wiring: the extensions class must work through
  * `SparkSession.builder.withExtensions` (the `spark.sql.extensions`
  * config path), not only via the runtime `install` helper. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects rule + strategy at session build time") {
    val base = TestSpark.spark // ensure a SparkContext exists
    // getOrCreate reuses the default session (and would skip extensions),
    // so detach it first and build a genuinely new session on the same
    // context, then restore.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(spark ne base)
      val remote = spark.read.format("graft-sqldb")
        .option("dir", TestSpark.Sf0001).option("table", "nation").load()
      val joined = remote
        .join(spark.read.format("graft-sqldb")
            .option("dir", TestSpark.Sf0001).option("table", "region").load(),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"))
        .orderBy("r_name", "n_name")
      val pushed = joined.queryExecution.optimizedPlan.collect {
        case p: PushedSqlQuery => p
      }
      assert(pushed.size == 1, joined.queryExecution.optimizedPlan.toString)
      assert(joined.count() == 25)

      // sliceGen is NOT part of plan identity (r14 advisory): two logically
      // identical pushed plans must compare equal (and sameResult) even
      // when their slice thunks are distinct closures — otherwise
      // ReuseExchange/ReuseSubquery can never dedup a pushed subtree
      val p = pushed.head
      val qa = PushedSqlQuery(p.output, p.sql, p.backend)(() => Seq("x"))
      val qb = PushedSqlQuery(p.output, p.sql, p.backend)(() => Seq("y"))
      assert(qa == qb, "closures in a product field defeat plan equality")
      assert(qa.sameResult(qb))
      // …while tree copies (transform/withNewChildren paths) still carry
      // the thunk through otherCopyArgs
      val copied = qa.makeCopy(Array(qa.output, qa.sql, qa.backend))
        .asInstanceOf[PushedSqlQuery]
      assert(copied.sliceGen() == Seq("x"))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
