package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The jar-gated Cassandra binding: in this environment the connector is
  * absent, so the contract under test is (a) the probe correctly reports
  * unavailability, (b) read fails FAST with an actionable message (not a
  * late ClassNotFoundError inside Spark's source resolution), and (c) the
  * binding plugs into MigrateConfig through the MigrateSource seam like
  * any other source. With the connector jar present the same code path
  * resolves the format and no gate fires.
  */
class CassandraSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("connector probe reports absent in this environment") {
    assert(!CassandraSource.connectorAvailable)
  }

  test("read fails fast with an actionable message when the jar is missing") {
    val e = intercept[IllegalArgumentException] {
      CassandraSource("ks", "files").read(spark)
    }
    assert(e.getMessage.contains("spark-cassandra-connector"))
  }

  test("binding satisfies the MigrateSource seam (drop-in for Migrate)") {
    val src: MigrateSource = CassandraSource("ks", "files",
      options = Map("spark.cassandra.connection.host" -> "localhost"))
    val cfg = MigrateConfig(
      srcPath = "", keyCol = "file_id", numRanges = 4,
      sinkPath = "/tmp/never", checkpointPath = "/tmp/never",
      source = Some(src))
    assert(cfg.source.contains(src)) // compiles + composes; read is jar-gated
  }
}
