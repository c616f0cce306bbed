package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.sources.{JdbcBackend, SqlBackend}

/** Exactly-once streaming append into a federated JDBC table.
  *
  * Spark's foreachBatch contract is AT-LEAST-ONCE: after a failure or
  * restart the same micro-batch id is replayed, and a plain append sink
  * double-writes it. (The reference has no streaming surface at all;
  * this is the federation analog of the view store's replay-safe marker,
  * `MaterializedViews.mergeBatch`.) The classic staging-swap pattern
  * makes the append idempotent per batch id:
  *
  *  1. truncate the per-target STAGING table (clears a prior attempt's
  *     leftovers),
  *  2. land the micro-batch in staging through the normal PARALLEL
  *     executor-side sink, then VERIFY the staged row count against the
  *     batch's own count — a task that committed its backend transaction
  *     but died before reporting success is re-attempted by Spark and
  *     lands its partition twice; the count surplus detects exactly that
  *     (every double-landed partition adds ≥ 1 row), and a mismatch
  *     truncates and re-lands (bounded retries),
  *  3. in ONE backend transaction: staging → target INSERT-SELECT plus
  *     an INSERT of the batch id into the marker table, whose PRIMARY
  *     KEY makes a duplicate publish fail and roll back whole.
  *
  * Crash between 2 and 3 → no marker row → the replay truncates staging
  * and retries: nothing reached the target. Crash after 3 → marker row
  * present → the replay returns before writing anything. A zombie
  * driver racing the publish loses on the marker PK and rolls back
  * whole. The target therefore sees each batch exactly once across
  * batch replays, intra-batch task retries, and publish races. Scale
  * shape: step 2 is the executor-parallel transactional write path
  * (per-task batched INSERTs) plus one count over the staged batch;
  * step 3 is one backend-side set operation that never moves rows
  * through Spark.
  *
  * Concurrency contract: at most one ACTIVE driver lands a given batch
  * at a time (Spark's own rule — one streaming query per checkpoint);
  * the marker PK defends the publish against zombies, but two drivers
  * CONCURRENTLY landing the same batch into the shared staging table
  * would see each other's rows as count mismatches and livelock the
  * bounded retries. */
object ExactlyOnceSink {

  /** Landing attempts before giving up: > 1 re-land is already a repeat
    * double-commit-then-die task failure within one micro-batch. */
  private val MaxLandAttempts = 3

  /** `foreachBatch` body for exactly-once appends into `table` at `url`.
    * `table` must exist; the staging and marker side tables are created
    * on first use (`<table>__staging`, `<table>__batches`). Usage:
    * {{{
    * df.writeStream.foreachBatch(ExactlyOnceSink(url, "events")_).start()
    * }}}
    * CONTRACT: one target table belongs to one logical stream, because
    * batch ids are only unique per CHECKPOINT — the id sequence restarts
    * at 0 under a fresh checkpoint, and the marker would silently skip
    * those "replays". Restarting a query with its checkpoint intact is
    * the supported path (ids continue); abandoning the checkpoint means
    * truncating `<table>__batches` (and deciding what the already-landed
    * rows now mean) — the same contract every batch-id-keyed idempotent
    * sink carries, stated instead of implied. */
  def apply(url: String, table: String)(batch: DataFrame, id: Long): Unit =
    run(url, table, batch, id, upsertKeys = Nil)

  /** Exactly-once UPSERT variant: the publish folds the staged batch into
    * the target with ANSI MERGE on `keys` instead of appending — the sink
    * for streams that RE-state rows (dimension refreshes, late-arriving
    * corrections) rather than append facts. Same staging + marker
    * machinery, same replay/zombie guarantees; additionally idempotent BY
    * KEY, so a re-stated row updates in place. The batch must be
    * key-unique (the MERGE contract); `table` must exist on a
    * MERGE-bearing backend ([[SqlBackend.supportsMerge]]). */
  def upsert(url: String, table: String, keys: Seq[String])(
      batch: DataFrame, id: Long): Unit = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    run(url, table, batch, id, upsertKeys = keys)
  }

  private def run(url: String, table: String, batch: DataFrame, id: Long,
      upsertKeys: Seq[String]): Unit = {
    val backend = JdbcBackend.forUrl(url)
    val q = backend.dialect.quote _
    val staging = s"${table}__staging"
    val marker = s"${table}__batches"
    if (upsertKeys.nonEmpty) require(backend.supportsMerge,
      s"${backend.name} has no MERGE rendering — the upsert sink needs one")
    ensureTable(backend, marker,
      s"CREATE TABLE ${q(marker)} (${q("batch_id")} BIGINT NOT NULL PRIMARY KEY)")
    // clone the target's shape so INSERT-SELECT * lines up by position
    ensureTable(backend, staging,
      s"CREATE TABLE ${q(staging)} AS SELECT * FROM ${q(table)} WITH NO DATA")
    if (markerPresent(backend, marker, id)) return
    // the batch is consumed twice (count + landing): pin it so the
    // second pass replays storage, not the upstream plan
    batch.persist()
    try {
      landVerified(backend, staging, batch.count(), () =>
        batch.write.format("graft-sqldb").option("url", url)
          .option("table", staging).mode("append").save())
    } finally batch.unpersist()
    publish(backend, table, staging, marker, id, upsertKeys)
    // best-effort: leftovers are also cleared by the next batch's step 1
    try backend.executeUpdate(s"DELETE FROM ${q(staging)}")
    catch { case _: Throwable => }
  }

  /** CREATE unless present, tolerating the cross-process bootstrap race:
    * two drivers can both see the table absent and both CREATE — the
    * loser's error is fine iff the table exists afterwards. (No JVM lock:
    * it wouldn't reach a second driver process anyway.) */
  private def ensureTable(backend: SqlBackend, name: String, ddl: String): Unit =
    if (!backend.tableExists(name))
      try backend.executeUpdate(ddl)
      catch { case t: Throwable => if (!backend.tableExists(name)) throw t }

  private def markerPresent(backend: SqlBackend, marker: String, id: Long): Boolean =
    backend.executeSql(
      s"SELECT COUNT(*) FROM ${backend.dialect.quote(marker)} " +
        s"WHERE ${backend.dialect.quote("batch_id")} = $id")
      .head.get(0).asInstanceOf[Number].longValue > 0

  /** Step 2: truncate + land + count-verify, retried. `expected` is the
    * batch's own row count; a surplus means some partition landed twice
    * (a committed-then-died task re-attempt — the at-least-once window
    * INSIDE one batch attempt that the batch-id marker cannot see). */
  private[graft] def landVerified(backend: SqlBackend, staging: String,
      expected: Long, land: () => Unit): Unit = {
    val q = backend.dialect.quote _
    var attempt = 0
    while (attempt < MaxLandAttempts) {
      attempt += 1
      backend.executeUpdate(s"DELETE FROM ${q(staging)}")
      land()
      val staged = backend.executeSql(s"SELECT COUNT(*) FROM ${q(staging)}")
        .head.get(0).asInstanceOf[Number].longValue
      if (staged == expected) return
      if (attempt >= MaxLandAttempts) throw new IllegalStateException(
        s"staging ${staging} landed $staged rows for a $expected-row batch " +
          s"after $attempt attempts — persistent task-retry duplication")
    }
  }

  /** Step 3: the atomic publish — append (`upsertKeys` empty) or MERGE.
    * Safe to race: the marker PK aborts the loser's whole transaction, and
    * the loser confirms the winner's marker row before swallowing the
    * failure. */
  private[graft] def publish(backend: SqlBackend, table: String,
      staging: String, marker: String, id: Long,
      upsertKeys: Seq[String] = Nil): Unit = {
    val q = backend.dialect.quote _
    val txn = backend.connection.beginWrite()
    try {
      txn.executeUpdate(
        if (upsertKeys.isEmpty)
          s"INSERT INTO ${q(table)} SELECT * FROM ${q(staging)}"
        else graft.sources.SqlWrite.renderMerge(table, staging, upsertKeys,
          backend.schema(table).fieldNames.toSeq, backend.dialect))
      txn.executeUpdate(s"INSERT INTO ${q(marker)} VALUES ($id)")
      txn.commit()
    } catch {
      case t: Throwable =>
        try txn.rollback() catch { case s: Throwable => t.addSuppressed(s) }
        // a concurrent replay that won the publish race surfaces as the
        // marker PK violation — the batch IS in the target, exactly once
        if (!markerPresent(backend, marker, id)) throw t
    }
  }
}
