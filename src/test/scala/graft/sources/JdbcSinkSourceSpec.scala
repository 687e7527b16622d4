package graft.sources

import java.sql.DriverManager
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.pipeline.{Ddl, DerbyDialect}

/** Failure injector for the V2 writer's task-retry test (local mode =
  * one JVM, so the static flag reaches "executor" code).
  */
object V2WriteFailures {
  val remaining = new AtomicInteger(0)
}

/** The DataSource V2 write path against embedded Derby: rows land through
  * Spark's commit protocol, re-writes are absorbed by the key-idempotent
  * insert, commit messages roll up counts, WAL transitions complete, and
  * a task that fails AFTER some committed batches is retried by Spark
  * with the retry absorbed (effectively-once without a coordinator —
  * the idempotent sink IS the commit protocol).
  */
class JdbcSinkSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  Class.forName("org.apache.derby.jdbc.EmbeddedDriver")

  private val sinkSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("range_id", LongType)))

  private def freshUrl(): String = {
    val url = s"jdbc:derby:memory:v2w_${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val conn = DriverManager.getConnection(url)
    try Ddl.ensureTables(conn, DerbyDialect, "files_v2", sinkSchema, Seq("id"))
    finally conn.close()
    url
  }

  private def testDf = {
    import spark.implicits._
    spark.range(200).select(
      $"id", concat(lit("n"), $"id").as("name"), ($"id" % 4).as("range_id"))
  }

  private def writeV2(url: String, df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("graft.sources.JdbcSinkSource")
      .option("url", url).option("table", "files_v2")
      .option("keyCols", "id").option("dialect", "derby")
      .option("batchSize", "37").option("walTable", "migration_wal")
      .mode("append").save()

  private def queryLong(url: String, sql: String): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      rs.next(); rs.getLong(1)
    } finally conn.close()
  }

  test("V2 write lands every row; commit message counts roll up; WAL complete") {
    val url = freshUrl()
    writeV2(url, testDf)
    assert(queryLong(url, "SELECT COUNT(*) FROM \"files_v2\"") == 200L)
    assert(JdbcSinkSource.lastCommittedCounts.get("files_v2") == 200L)
    assert(queryLong(url,
      "SELECT COUNT(*) FROM \"migration_wal\" WHERE \"status\" <> 'COMMITTED'") == 0L)
  }

  test("re-writing the same data through the V2 path is a no-op on the keys") {
    val url = freshUrl()
    writeV2(url, testDf)
    writeV2(url, testDf)
    assert(queryLong(url, "SELECT COUNT(*) FROM \"files_v2\"") == 200L)
  }

  test("null columns land as SQL NULL, not zero/false/NPE") {
    val url = freshUrl()
    val df = testDf.withColumn("name",
      when(col("id") % 3 === 0, lit(null: String)).otherwise(concat(lit("n"), col("id"))))
    writeV2(url, df)
    assert(queryLong(url, "SELECT COUNT(*) FROM \"files_v2\"") == 200L)
    // 0,3,6,...,198 -> 67 nulls; they must be NULL, not the string "null"/"0"
    assert(queryLong(url, "SELECT COUNT(*) FROM \"files_v2\" WHERE \"name\" IS NULL") == 67L)
    assert(queryLong(url,
      "SELECT COUNT(*) FROM \"files_v2\" WHERE \"name\" IS NOT NULL AND \"name\" LIKE 'n%'") == 133L)
  }

  test("user/password options reach the connection (authenticated target)") {
    // Derby with BUILTIN auth: create the db, require authentication at
    // the database level, reboot it, then prove the V2 writer can only
    // connect when the options are forwarded.
    val name = s"v2auth_${java.util.UUID.randomUUID().toString.take(8)}"
    val url = s"jdbc:derby:memory:$name"
    val conn = DriverManager.getConnection(s"$url;create=true")
    try {
      Ddl.ensureTables(conn, DerbyDialect, "files_v2", sinkSchema, Seq("id"))
      val st = conn.createStatement()
      st.executeUpdate("CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY(" +
        "'derby.user.app', 'secret')")
      st.executeUpdate("CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY(" +
        "'derby.connection.requireAuthentication', 'true')")
      st.close()
    } finally conn.close()
    // reboot so the static auth property takes effect
    intercept[java.sql.SQLException] {
      DriverManager.getConnection(s"$url;shutdown=true")
    }
    // unauthenticated connects are now refused...
    intercept[java.sql.SQLException] { DriverManager.getConnection(url) }
    // ...and the V2 write succeeds only because the options are forwarded
    testDf.write.format("graft.sources.JdbcSinkSource")
      .option("url", url).option("table", "files_v2")
      .option("user", "app").option("password", "secret")
      .option("keyCols", "id").option("dialect", "derby")
      .option("batchSize", "37")
      .mode("append").save()
    val check = DriverManager.getConnection(url, "app", "secret")
    try {
      val rs = check.createStatement().executeQuery("SELECT COUNT(*) FROM \"files_v2\"")
      rs.next(); assert(rs.getLong(1) == 200L)
    } finally check.close()
  }

  test("failed write job resubmitted: committed partial batches are absorbed") {
    val url = freshUrl()
    V2WriteFailures.remaining.set(1)
    // one of two partitions dies (local mode has no task retries, so the
    // JOB fails) — the OTHER partition may have fully committed its
    // batches by then, leaving partial sink state. The resubmitted job
    // re-writes everything; the key-idempotent insert absorbs the overlap.
    val df = testDf.repartition(2).mapPartitions { it =>
      val rows = it.toVector
      if (V2WriteFailures.remaining.getAndDecrement() > 0)
        throw new RuntimeException("induced task failure before writer commit")
      rows.iterator
    }(org.apache.spark.sql.Encoders.row(testDf.schema))
    intercept[Exception] { writeV2(url, df.toDF()) }
    val partial = queryLong(url, "SELECT COUNT(*) FROM \"files_v2\"")
    assert(partial < 200L, s"failed job must not report a full write ($partial)")
    writeV2(url, testDf) // the resubmission
    assert(queryLong(url, "SELECT COUNT(*) FROM \"files_v2\"") == 200L)
    assert(queryLong(url, "SELECT COUNT(DISTINCT \"id\") FROM \"files_v2\"") == 200L)
  }
}
