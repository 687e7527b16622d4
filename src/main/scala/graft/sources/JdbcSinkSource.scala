package graft.sources

import java.sql.DriverManager
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.pipeline.{DerbyDialect, MySqlDialect, Retry, SqlDialect}

/** DataSource V2 WRITE binding of the idempotent JDBC sink — the K1/K2
  * semantics (graft.pipeline.JdbcSink) surfaced through Spark's native
  * commit protocol instead of foreachPartition:
  *
  *  - each DataWriter owns one connection and runs the same
  *    batch-in-transaction WAL discipline (STARTED -> rows -> COMMITTED
  *    -> commit, transient retry with backoff);
  *  - task abort rolls back the open transaction; a RETRIED task re-runs
  *    against the key-idempotent insert, so the job-level contract stays
  *    effectively-once — which is exactly why BatchWrite.abort/commit can
  *    be coordination-free here (the sink is its own commit protocol);
  *  - commit messages carry per-task row counts, summed driver-side and
  *    exposed for validation (K4's count reconciliation hook).
  *
  * Usage:
  *   df.write.format("graft.sources.JdbcSinkSource")
  *     .option("url", ...).option("table", t).option("keyCols", "id")
  *     .option("dialect", "derby").mode("append").save()
  */
class JdbcSinkSource extends TableProvider {
  // schema comes from the written DataFrame, not the source
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new JdbcSinkTable(schema,
      properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap)
}

object JdbcSinkSource {
  /** Rows written by the last committed batch write, per sink table —
    * the K4 validation hook (driver-side, control-sized).
    */
  val lastCommittedCounts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
}

private[sources] final case class JdbcWriteConfig(
    url: String,
    user: Option[String],
    password: Option[String],
    table: String,
    keyCols: Seq[String],
    dialectName: String,
    batchSize: Int,
    walTable: Option[String],
    schema: StructType) {
  def dialect: SqlDialect =
    if (dialectName == "mysql") MySqlDialect else DerbyDialect
}

private[sources] class JdbcSinkTable(writeSchema: StructType, props: Map[String, String])
    extends Table with SupportsWrite {

  private def cfg(schema: StructType) = JdbcWriteConfig(
    url = props.getOrElse("url", sys.error("JdbcSinkSource requires option url")),
    user = props.get("user").filter(_.nonEmpty),
    password = props.get("password").filter(_.nonEmpty),
    table = props.getOrElse("table", sys.error("JdbcSinkSource requires option table")),
    keyCols = props.getOrElse("keycols", "").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
    dialectName = props.getOrElse("dialect", "derby"),
    batchSize = props.getOrElse("batchsize", "500").toInt,
    walTable = props.get("waltable").filter(_.nonEmpty),
    schema = schema)

  override def name(): String = s"jdbc_sink(${props.getOrElse("table", "?")})"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new JdbcBatchWrite(cfg(info.schema()))
      }
    }
}

private[sources] final case class RowsWritten(n: Long) extends WriterCommitMessage

private[sources] class JdbcBatchWrite(cfg: JdbcWriteConfig) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new JdbcDataWriterFactory(cfg)

  /** The sink is key-idempotent, so the job-level commit needs no
    * coordination — only the count roll-up for validation (K4).
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val total = messages.collect { case RowsWritten(n) => n }.sum
    JdbcSinkSource.lastCommittedCounts.put(cfg.table, total)
  }

  /** Partial task output was either rolled back (open txn) or committed
    * in earlier batches — the retry re-runs those rows into the
    * idempotent insert, so global abort has nothing to undo.
    */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class JdbcDataWriterFactory(cfg: JdbcWriteConfig) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JdbcDataWriter(cfg, partitionId)
}

/** One connection per task; same transaction/WAL/retry discipline as
  * graft.pipeline.JdbcSink, over InternalRow.
  */
private[sources] class JdbcDataWriter(cfg: JdbcWriteConfig, partitionId: Int)
    extends DataWriter[InternalRow] {

  private val dialect = cfg.dialect
  private val fields = cfg.schema.fields
  private val columns = fields.map(_.name).toSeq
  private val types = fields.map(f => f.name -> f.dataType).toMap
  private val rangeIdx = columns.indexOf("range_id")

  // Connection opens on FIRST ROW, not at writer creation — and close()
  // and abort() must not touch it for an empty partition (a plain lazy
  // val would open a pointless connection per empty task at close time).
  private var connOpt: Option[java.sql.Connection] = None
  private def conn: java.sql.Connection = connOpt.getOrElse {
    // getConnection(url, null, null) omits the absent credentials, so the
    // embedded/no-auth targets keep working while authenticated ones connect.
    val c = DriverManager.getConnection(cfg.url, cfg.user.orNull, cfg.password.orNull)
    dialect.sessionInit(c)
    connOpt = Some(c)
    c
  }
  private lazy val insert =
    conn.prepareStatement(dialect.insertIgnoreSql(cfg.table, columns, cfg.keyCols, types))
  private lazy val wal = cfg.walTable.map(w => dialect.walDao(conn, w))
  private val bindCols = dialect.insertBindCols(columns, cfg.keyCols)
  private val bindIdx = bindCols.map(c => columns.indexOf(c))
  private val bindSqlTypes = bindIdx.map(i => fields(i).dataType match {
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case DoubleType => java.sql.Types.DOUBLE
    case StringType => java.sql.Types.VARCHAR
    case BooleanType => java.sql.Types.BOOLEAN
    case other => sys.error(s"JdbcSinkSource: unsupported write type $other")
  })

  private val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
  private var batchIndex = 0
  private var written = 0L

  // Nulls pass through as null (bound via setNull below) — matching the
  // classic JdbcSink, which writes Row nulls with setObject.
  private def fieldValue(row: InternalRow, i: Int): Any =
    if (row.isNullAt(i)) null
    else fields(i).dataType match {
      case LongType => row.getLong(i)
      case IntegerType => row.getInt(i)
      case DoubleType => row.getDouble(i)
      case StringType => row.getUTF8String(i).toString
      case BooleanType => row.getBoolean(i)
      case other => sys.error(s"JdbcSinkSource: unsupported write type $other")
    }

  override def write(row: InternalRow): Unit = {
    buf += fields.indices.map(i => fieldValue(row, i)).toArray
    if (buf.size >= cfg.batchSize) flush()
  }

  private def flush(): Unit = if (buf.nonEmpty) {
    val batchId = graft.pipeline.JdbcSink.deterministicBatchId(partitionId, batchIndex)
    val rangeId = if (rangeIdx >= 0) buf.head(rangeIdx) match {
      case l: Long => l; case i: Int => i.toLong; case _ => -1L
    } else -1L
    Retry.withBackoff(5, 1, Retry.isSqlTransient) {
      try {
        wal.foreach(_.start(rangeId, batchId))
        buf.foreach { vals =>
          bindIdx.zipWithIndex.foreach { case (src, bi) =>
            val v = vals(src)
            if (v == null) insert.setNull(bi + 1, bindSqlTypes(bi))
            else insert.setObject(bi + 1, v)
          }
          insert.addBatch()
        }
        insert.executeBatch()
        wal.foreach(_.commit(rangeId, batchId))
        conn.commit()
      } catch {
        case e: Throwable => insert.clearBatch(); conn.rollback(); throw e
      }
    }
    written += buf.size
    buf.clear(); batchIndex += 1
  }

  override def commit(): WriterCommitMessage = { flush(); RowsWritten(written) }

  override def abort(): Unit = connOpt.foreach { c =>
    try c.rollback() catch { case _: Throwable => () }
  }

  override def close(): Unit = connOpt.foreach { c =>
    try insert.close() finally {
      try wal.foreach(_.close()) finally c.close()
    }
  }
}
