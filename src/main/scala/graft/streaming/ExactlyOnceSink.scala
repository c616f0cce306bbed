package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.sources.JdbcBackend

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
  *     executor-side sink — at-least-once is fine here, staging is
  *     private to this batch attempt,
  *  3. in ONE backend transaction: staging → target INSERT-SELECT plus
  *     an INSERT of the batch id into the marker table, whose PRIMARY
  *     KEY makes a duplicate publish fail and roll back whole.
  *
  * Crash between 2 and 3 → no marker row → the replay truncates staging
  * and retries: nothing reached the target. Crash after 3 → marker row
  * present → the replay returns before writing anything. The target
  * therefore sees each batch exactly once, no matter how many times the
  * engine replays it. Scale shape: step 2 is the executor-parallel
  * transactional write path (per-task batched INSERTs); step 3 is one
  * backend-side set operation that never moves rows through Spark. */
object ExactlyOnceSink {

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
  def apply(url: String, table: String)(batch: DataFrame, id: Long): Unit = {
    val backend = JdbcBackend.forUrl(url)
    val q = backend.dialect.quote _
    val staging = s"${table}__staging"
    val marker = s"${table}__batches"
    synchronized {
      if (!backend.tableExists(marker))
        backend.executeUpdate(
          s"CREATE TABLE ${q(marker)} (${q("batch_id")} BIGINT NOT NULL PRIMARY KEY)")
      if (!backend.tableExists(staging))
        // clone the target's shape so INSERT-SELECT * lines up by position
        backend.executeUpdate(
          s"CREATE TABLE ${q(staging)} AS SELECT * FROM ${q(table)} WITH NO DATA")
    }
    val replayed = backend.executeSql(
      s"SELECT COUNT(*) FROM ${q(marker)} WHERE ${q("batch_id")} = $id")
      .head.get(0).asInstanceOf[Number].longValue > 0
    if (replayed) return
    backend.executeUpdate(s"DELETE FROM ${q(staging)}")
    batch.write.format("graft-sqldb").option("url", url)
      .option("table", staging).mode("append").save()
    val txn = backend.connection.beginWrite()
    try {
      txn.executeUpdate(
        s"INSERT INTO ${q(table)} SELECT * FROM ${q(staging)}")
      txn.executeUpdate(s"INSERT INTO ${q(marker)} VALUES ($id)")
      txn.commit()
    } catch {
      case t: Throwable =>
        try txn.rollback() catch { case s: Throwable => t.addSuppressed(s) }
        // a concurrent replay that won the publish race surfaces as the
        // marker PK violation — the batch IS in the target, exactly once
        val won = backend.executeSql(
          s"SELECT COUNT(*) FROM ${q(marker)} WHERE ${q("batch_id")} = $id")
          .head.get(0).asInstanceOf[Number].longValue > 0
        if (!won) throw t
    }
    // best-effort: leftovers are also cleared by the next batch's step 1
    try backend.executeUpdate(s"DELETE FROM ${q(staging)}")
    catch { case _: Throwable => }
  }
}
