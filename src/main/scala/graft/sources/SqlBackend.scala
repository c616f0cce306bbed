package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Connection-agnostic SQL backend — the Spark analog of the reference's
  * `DatabaseConnector`/`DatabaseConnection` traits (`src/sqldb/mod.rs:34-71`):
  * the engine talks to the external store exclusively through SQL text plus
  * result rows, so any RDBMS (the reference uses Postgres via binary COPY,
  * `src/sqldb/postgres/mod.rs:24-190`) can sit behind it.
  */
trait SqlBackend extends Serializable {
  /** Backend name for explain output. */
  def name: String
  /** Identifier quoting of the backend's dialect. */
  def dialect: graft.plans.SqlGen.Dialect
  /** Available table names (the catalog surface, analog of
    * `load_catalog`, `src/sqldb/postgres/mod.rs:67-125`). */
  def tables: Seq[String]
  def schema(table: String): StructType
  /** Driver-side query returning materialized rows (used for partition
    * planning probes and small result fetches). */
  def executeSql(sql: String): Seq[Row]
  /** Whole-query execution returning a distributed handle — the analog of
    * `DatabaseExec` streaming Arrow batches (`src/physical_plan.rs:28-132`). */
  def executeSqlToRdd(sql: String, expected: StructType): RDD[InternalRow]
}

/** Test double standing in for a remote RDBMS: a *separate* SparkSession
  * (isolated catalog state, `newSession`) with the scale-dir parquet files
  * registered as views. The only interface between the engine under test
  * and this backend is SQL text + rows — the same contract a Postgres
  * backend would have (no live RDBMS exists in this environment; a
  * production impl would be a thin JDBC wrapper with identical surface).
  */
object SparkViewBackend {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, SparkViewBackend]()
  /** One backend per dir — multiple table providers over the same "database"
    * share the connection-equivalent, so the pushdown rule can fuse
    * multi-table subtrees (same-backend check). */
  def forDir(dir: String): SparkViewBackend =
    cache.computeIfAbsent(dir, d => new SparkViewBackend(d))
}

class SparkViewBackend(dir: String) extends SqlBackend {
  // `dir` is the only state; the backend session is reconstructed lazily

  override def name: String = s"spark-view($dir)"
  override def dialect: graft.plans.SqlGen.Dialect = graft.plans.SqlGen.SparkSqlDialect

  // rebuilt if the underlying context was stopped: backends are cached
  // per dir for the JVM lifetime, which can outlive the SparkSession
  // active at first use (test suites, session restarts)
  @transient private var cachedSession: SparkSession = _
  private def session: SparkSession = synchronized {
    if (cachedSession == null || cachedSession.sparkContext.isStopped) {
      val s = SparkSession.active.newSession()
      graft.Tables.names.foreach { t =>
        graft.Tables.load(s, dir, t).createOrReplaceTempView(t)
      }
      cachedSession = s
    }
    cachedSession
  }

  override def tables: Seq[String] = graft.Tables.names
  override def schema(table: String): StructType = session.table(table).schema
  override def executeSql(sql: String): Seq[Row] = session.sql(sql).collect().toSeq
  override def executeSqlToRdd(sql: String, expected: StructType): RDD[InternalRow] = {
    val df = session.sql(sql)
    // types, not just arity: InternalRows decoded against a mismatched
    // schema read wrong offsets/widths — silent corruption, not an error
    require(df.schema.map(_.dataType) == expected.map(_.dataType),
      s"backend schema ${df.schema.map(_.dataType).mkString(",")} != " +
        s"expected ${expected.map(_.dataType).mkString(",")} for: $sql")
    df.queryExecution.toRdd
  }
}
