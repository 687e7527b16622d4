package graft.pipeline

import java.sql.{DriverManager, SQLTransientException}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Failure injector for the sink's onBatch test seam. Local-mode tests
  * share one JVM, so a static counter is visible to "executors".
  */
object JdbcFailures {
  val remaining = new AtomicInteger(0)
  val calls = new AtomicInteger(0)
  def reset(n: Int): Unit = { remaining.set(n); calls.set(0) }
}

/** Drives the REAL JdbcSink.write foreachPartition path against embedded
  * Derby (jars ship with Spark): K5 DDL bootstrap, K1 idempotent insert
  * (re-run is a no-op), K2/T3 WAL STARTED->COMMITTED, T4 transient retry
  * with backoff, rollback on fatal error, control-table truncate.
  *
  * Reference semantics: snapshot_use_pyspark.py:63-101 (DDL), 293-340
  * (batched INSERT IGNORE + WAL + deadlock retry), 429-444 (truncate).
  */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  Class.forName("org.apache.derby.jdbc.EmbeddedDriver")

  private def freshUrl(): String =
    s"jdbc:derby:memory:graft_${java.util.UUID.randomUUID().toString.take(8)};create=true"

  private val sinkSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def testDf = {
    import spark.implicits._
    spark.range(100).select(
      $"id",
      concat(lit("n"), $"id").as("name"),
      ($"id" % 4).as("range_id"))
  }

  private def cfg(url: String) = JdbcSink.JdbcConfig(
    url = url, user = "", password = "",
    table = "files", columns = Seq("id", "name"), keyCols = Seq("id"),
    dialect = DerbyDialect, batchSize = 7,
    walTable = Some("migration_wal"), retryBaseDelayMs = 1)

  private def bootstrap(url: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      Ddl.ensureTables(conn, DerbyDialect, "files", sinkSchema, Seq("id"))
      // idempotent: second call is a no-op, not an error
      Ddl.ensureTables(conn, DerbyDialect, "files", sinkSchema, Seq("id"))
    } finally conn.close()
  }

  private def queryLong(url: String, sql: String): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      rs.next(); rs.getLong(1)
    } finally conn.close()
  }

  test("DDL bootstrap + write lands every row; WAL batches all COMMITTED") {
    val url = freshUrl()
    bootstrap(url)
    JdbcSink.write(testDf, cfg(url))
    assert(queryLong(url, "SELECT COUNT(*) FROM \"files\"") == 100L)
    val walTotal = queryLong(url, "SELECT COUNT(*) FROM \"migration_wal\"")
    val walCommitted = queryLong(url,
      "SELECT COUNT(*) FROM \"migration_wal\" WHERE \"status\" = 'COMMITTED'")
    assert(walTotal > 0 && walCommitted == walTotal)
  }

  test("re-running the same write is idempotent (effectively-once on the key)") {
    val url = freshUrl()
    bootstrap(url)
    JdbcSink.write(testDf, cfg(url))
    JdbcSink.write(testDf, cfg(url))
    assert(queryLong(url, "SELECT COUNT(*) FROM \"files\"") == 100L)
    assert(queryLong(url,
      "SELECT COUNT(*) FROM \"migration_wal\" WHERE \"status\" <> 'COMMITTED'") == 0L)
  }

  test("transient failures are retried with backoff and the write completes") {
    val url = freshUrl()
    bootstrap(url)
    JdbcFailures.reset(3)
    val c = cfg(url).copy(onBatch = (_, _) => {
      JdbcFailures.calls.incrementAndGet()
      if (JdbcFailures.remaining.getAndDecrement() > 0)
        throw new SQLTransientException("induced deadlock")
    })
    JdbcSink.write(testDf, c)
    assert(queryLong(url, "SELECT COUNT(*) FROM \"files\"") == 100L)
    // every injected failure forced a retry of that batch
    val batches = queryLong(url, "SELECT COUNT(*) FROM \"migration_wal\"")
    assert(JdbcFailures.calls.get() >= batches + 3)
  }

  test("fatal (non-transient) failure rolls back the batch and propagates") {
    val url = freshUrl()
    bootstrap(url)
    val c = cfg(url).copy(onBatch = (_, _) =>
      throw new IllegalStateException("not transient"))
    intercept[Exception] { JdbcSink.write(testDf, c) }
    // every partition failed its FIRST batch inside the txn -> rollback
    // means neither rows nor WAL entries survive
    assert(queryLong(url, "SELECT COUNT(*) FROM \"files\"") == 0L)
    assert(queryLong(url, "SELECT COUNT(*) FROM \"migration_wal\"") == 0L)
  }

  test("batch boundaries: batchSize=1 and row count an exact batch multiple") {
    // batchSize 1 stresses per-batch WAL/commit overhead paths; an exact
    // multiple of batchSize exercises the no-trailing-partial-flush path.
    val url1 = freshUrl()
    bootstrap(url1)
    JdbcSink.write(testDf, cfg(url1).copy(batchSize = 1))
    assert(queryLong(url1, "SELECT COUNT(*) FROM \"files\"") == 100L)
    val url2 = freshUrl()
    bootstrap(url2)
    JdbcSink.write(testDf.repartition(4), cfg(url2).copy(batchSize = 25))
    assert(queryLong(url2, "SELECT COUNT(*) FROM \"files\"") == 100L)
    assert(queryLong(url2,
      "SELECT COUNT(*) FROM \"migration_wal\" WHERE \"status\" <> 'COMMITTED'") == 0L)
  }

  test("truncateControlTables resets WAL/checkpoints but keeps sink rows") {
    val url = freshUrl()
    bootstrap(url)
    JdbcSink.write(testDf, cfg(url))
    val conn = DriverManager.getConnection(url)
    try Ddl.truncateControlTables(conn, DerbyDialect) finally conn.close()
    assert(queryLong(url, "SELECT COUNT(*) FROM \"files\"") == 100L)
    assert(queryLong(url, "SELECT COUNT(*) FROM \"migration_wal\"") == 0L)
  }

  test("production (MySQL) SQL text is the reference's surface") {
    val c = JdbcSink.JdbcConfig("jdbc:mysql://h/db", "u", "p", "files",
      columns = Seq("id", "name"), keyCols = Seq("id"))
    assert(JdbcSink.insertIgnoreSql(c) ==
      "INSERT IGNORE INTO `files` (`id`, `name`) VALUES (?, ?)")
    assert(JdbcSink.walStartSql("wal").contains("ON DUPLICATE KEY UPDATE"))
    assert(JdbcSink.walCommitSql("wal").startsWith("UPDATE `wal` SET status = 'COMMITTED'"))
  }
}
