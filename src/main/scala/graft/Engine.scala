package graft

import org.apache.spark.sql.SparkSession

/** One-call engine bootstrap — SURVEY.md §7.2 M0's `EngineSession`: builds
  * the session the way every driver entry point (Bench/Verify) configures
  * it, registers the catalog (the analog of the reference's
  * `load_catalog`, `src/sqldb/postgres/mod.rs:67-125`), and optionally
  * installs the federated pushdown rule + strategy.
  *
  * A user of the reference switches to this engine with:
  * {{{
  *   val spark = Engine.create()
  *   Engine.attach(spark, "/data/tables")   // parquet dir -> temp views
  *   spark.sql("SELECT ... FROM lineitem JOIN orders ON ...")
  * }}}
  */
object Engine {

  /** Session defaults that embody the scale design (SCALE.md): AQE on for
    * runtime coalescing/skew handling, shuffle partitions sized to cores
    * (not the 200 default), UTC so timestamp semantics match the oracle. */
  def create(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Option[Int] = None,
      federation: Boolean = true): SparkSession = {
    val cores = master match {
      case Engine.LocalN(n) => n.toInt
      case _ => Runtime.getRuntime.availableProcessors()
    }
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-engine")
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // SQL-surface registration of the native expressions (dot_i8,
    // cosine_f32, minhash_sig, …): a spark.sql user gets the full
    // function set without touching the Column API
    graft.functions.GraftFunctions.register(spark)
    if (federation) {
      graft.plans.GraftExtensions.install(spark)
      // 3-level catalog surface: graft_db.main.<table> resolves once a
      // backing dir is attached (catalog plugins instantiate lazily, so
      // registering the conf up front costs nothing until first use)
      spark.conf.set("spark.sql.catalog.graft_db",
        classOf[graft.sources.GraftCatalog].getName)
      // DSv2 join pushdown (SupportsPushDownJoin): whole equi-joins over
      // same-backend scans — and the aggregate/top-N above them — run as
      // one backend query. Off by default in Spark; the engine's scans
      // negotiate it safely, so the engine turns it on.
      spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
    }
    spark
  }

  private val LocalN = """local\[(\d+)\]""".r

  /** Register every table under `dir` as a temp view (parquet footers are
    * the schema source — no information_schema round trip needed) and
    * point the graft_db catalog at the same dir, so both unqualified
    * (`lineitem`) and catalog-qualified (`graft_db.main.lineitem`) names
    * resolve. */
  def attach(spark: SparkSession, dir: String): Unit = {
    Tables.registerAll(spark, dir)
    spark.conf.set("graft.catalog.dir", dir)
  }

  /** Point the graft_db catalog at a live JDBC database instead of a
    * parquet dir — `graft_db.main.<table>` then resolves through
    * [[graft.sources.JdbcBackend]] with the full pushdown surface
    * (projection/filter/top-N/aggregate/join) and the executor-side
    * transactional write path.
    *
    * Session-conf based, so it only affects catalogs registered WITHOUT
    * their own `dir`/`url` option (such as the one [[create]] registers):
    * a catalog explicitly bound via `spark.sql.catalog.<name>.dir` keeps
    * its binding — per-catalog options always win over session confs
    * (see [[graft.sources.GraftCatalog]] resolution order). */
  def attachJdbc(spark: SparkSession, url: String): Unit =
    spark.conf.set("graft.catalog.url", url)
}
