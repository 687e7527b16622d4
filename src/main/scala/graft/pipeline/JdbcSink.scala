package graft.pipeline

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row}

/** Production sink binding: batched idempotent JDBC writes with WAL and
  * deadlock retry — the reference's K1/K2/T3/T4/T8 semantics
  * (snapshot_use_pyspark.py:293-340) as a foreachPartition writer.
  *
  * Contract per batch, inside ONE transaction (READ COMMITTED,
  * autocommit off — T8):
  *   1. WAL row (range_id, batch_id, 'STARTED')         — K2/T3
  *   2. INSERT IGNORE INTO <table> (...) VALUES (...)   — K1 (idempotent
  *      via the sink table's unique key; re-runs are no-ops)
  *   3. WAL row update -> 'COMMITTED'
  *   4. commit; on transient failure (deadlock 1213 / lock-wait 1205):
  *      rollback + exponential backoff, up to 5 attempts — T4; anything
  *      else propagates so the Spark task retries — T5's escalation.
  *
  * Batch ids are deterministic — (partitionId << 20) | batchIndex — unlike
  * the reference's collision-prone time-derived ids (SURVEY §7.4).
  *
  * Not exercised by the parquet-fixture tests (no MySQL in the test env);
  * SQL text generation and the retry policy are unit-tested, and the
  * parquet binding in Migrate carries the same effectively-once contract.
  */
object JdbcSink {

  final case class JdbcConfig(
      url: String,
      user: String,
      password: String,
      table: String,
      columns: Seq[String],
      batchSize: Int = 5000,
      maxRetries: Int = 5,
      walTable: Option[String] = None)

  def insertIgnoreSql(cfg: JdbcConfig): String = {
    val cols = cfg.columns.mkString("`", "`, `", "`")
    val qs = Seq.fill(cfg.columns.size)("?").mkString(", ")
    s"INSERT IGNORE INTO `${cfg.table}` ($cols) VALUES ($qs)"
  }

  def walStartSql(wal: String): String =
    s"INSERT INTO `$wal` (range_id, batch_id, status, updated_at) VALUES (?, ?, 'STARTED', NOW()) " +
      "ON DUPLICATE KEY UPDATE status = 'STARTED', updated_at = NOW()"

  def walCommitSql(wal: String): String =
    s"UPDATE `$wal` SET status = 'COMMITTED', updated_at = NOW() WHERE range_id = ? AND batch_id = ?"

  def deterministicBatchId(partitionId: Int, batchIndex: Int): Long =
    (partitionId.toLong << 20) | batchIndex.toLong

  /** Write a DataFrame whose columns match cfg.columns (plus a range_id
    * column used for WAL bookkeeping).
    */
  def write(df: DataFrame, cfg: JdbcConfig): Unit = {
    val cols = cfg.columns
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val conn = DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
        try {
          conn.setAutoCommit(false)
          conn.createStatement().execute(
            "SET SESSION TRANSACTION ISOLATION LEVEL READ COMMITTED")
          val insert = conn.prepareStatement(insertIgnoreSql(cfg))
          val buf = new scala.collection.mutable.ArrayBuffer[Row](cfg.batchSize)
          var batchIndex = 0
          def flush(): Unit = if (buf.nonEmpty) {
            val batchId = deterministicBatchId(pid, batchIndex)
            val rangeId = buf.head.getAs[Any]("range_id") match {
              case l: Long => l; case i: Int => i.toLong; case _ => -1L
            }
            Retry.withBackoff(cfg.maxRetries, 500, Retry.isMySqlTransient) {
              try {
                cfg.walTable.foreach { w =>
                  val st = conn.prepareStatement(walStartSql(w))
                  st.setLong(1, rangeId); st.setLong(2, batchId); st.executeUpdate()
                }
                buf.foreach { r =>
                  cols.zipWithIndex.foreach { case (c, i) =>
                    insert.setObject(i + 1, r.getAs[Any](c))
                  }
                  insert.addBatch()
                }
                insert.executeBatch()
                cfg.walTable.foreach { w =>
                  val st = conn.prepareStatement(walCommitSql(w))
                  st.setLong(1, rangeId); st.setLong(2, batchId); st.executeUpdate()
                }
                conn.commit()
              } catch {
                case e: Throwable => conn.rollback(); throw e
              }
            }
            buf.clear(); batchIndex += 1
          }
          rows.foreach { r => buf += r; if (buf.size >= cfg.batchSize) flush() }
          flush()
        } finally conn.close()
      }
    }
  }
}
