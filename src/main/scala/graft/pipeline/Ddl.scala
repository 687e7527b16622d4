package graft.pipeline

import java.sql.Connection

import org.apache.spark.sql.types.StructType

/** K5 — target-database bootstrap, the reference's `ensure_mysql_tables`
  * and `truncate_control_tables` (snapshot_use_pyspark.py:63-101,
  * 429-444): create the sink table plus the three control tables iff
  * absent, and reset the control tables for a from-scratch run.
  *
  * Exercised end-to-end against embedded Derby in JdbcSinkSpec /
  * JdbcMigrateSpec; the MySQL dialect emits the production DDL text.
  */
object Ddl {

  /** The reference's control-table trio: WAL (K2), checkpoints (T2),
    * validation (K4).
    */
  final case class ControlTables(
      wal: String = "migration_wal",
      checkpoints: String = "migration_checkpoint",
      validation: String = "migration_validation")

  /** Create sink + control tables that don't exist yet (idempotent). */
  def ensureTables(
      conn: Connection,
      dialect: SqlDialect,
      sinkTable: String,
      sinkSchema: StructType,
      keyCols: Seq[String],
      control: ControlTables = ControlTables()): Unit = {
    val ddl = Seq(
      sinkTable -> dialect.createSinkTableSql(sinkTable, sinkSchema, keyCols),
      control.wal -> dialect.createWalTableSql(control.wal),
      control.checkpoints -> dialect.createCheckpointTableSql(control.checkpoints),
      control.validation -> dialect.createValidationTableSql(control.validation))
    val st = conn.createStatement()
    try {
      ddl.foreach { case (table, sql) =>
        if (!dialect.tableExists(conn, table)) st.executeUpdate(sql)
      }
      if (!conn.getAutoCommit) conn.commit()
    } finally st.close()
  }

  /** Wipe WAL + checkpoints (+ validation) for a forced full re-run —
    * the reference's truncate_control_tables. The sink table is NOT
    * touched: the idempotent insert makes re-migration safe.
    */
  def truncateControlTables(
      conn: Connection,
      dialect: SqlDialect,
      control: ControlTables = ControlTables()): Unit = {
    val st = conn.createStatement()
    try {
      Seq(control.wal, control.checkpoints, control.validation).foreach { t =>
        if (dialect.tableExists(conn, t)) st.executeUpdate(dialect.truncateSql(t))
      }
      if (!conn.getAutoCommit) conn.commit()
    } finally st.close()
  }
}
