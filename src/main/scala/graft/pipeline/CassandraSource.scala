package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Production source binding: the Spark Cassandra connector
  * (BASELINE.json `spark_approach`: "Spark connectors for Cassandra
  * read + JDBC write"; the reference connects its Cassandra session at
  * snapshot_use_pyspark.py:194-196 and iterates token ranges itself).
  *
  * The connector jar (com.datastax.spark:spark-cassandra-connector) does
  * not ship in this build environment, so the binding is JAR-GATED: it
  * compiles against nothing beyond the stable DataSource API (the format
  * is a string), probes for the connector reflectively at read time, and
  * fails fast with an actionable message when absent. With the jar on the
  * classpath no code changes are needed — the format resolves and reads
  * work as-is.
  *
  * Scale note: the connector derives its input splits from Cassandra's
  * native token ranges, so each Spark partition already IS a token-range
  * scan — the reference's per-range SELECT loop (S1/S2) becomes the
  * source's own partitioning. Use `cassandra_token` (CustomFns f2) as
  * MigrateConfig.tokenFn with the signed-64 ring for checkpoint parity
  * with the server's Murmur3Partitioner.
  */
final case class CassandraSource(
    keyspace: String,
    table: String,
    options: Map[String, String] = Map.empty) extends MigrateSource {

  def read(spark: SparkSession): DataFrame = {
    require(CassandraSource.connectorAvailable,
      "Cassandra connector not on the classpath (probe class " +
        s"${CassandraSource.ProbeClass} not found); submit with " +
        "--packages com.datastax.spark:spark-cassandra-connector_2.13 " +
        "to use this source")
    spark.read.format(CassandraSource.Format)
      .options(options)
      .option("keyspace", keyspace)
      .option("table", table)
      .load()
  }
}

object CassandraSource {
  /** DataSource name the connector registers (also usable as a catalog). */
  val Format = "org.apache.spark.sql.cassandra"

  /** A connector entry-point class, used purely as an availability probe
    * (loaded without initialization; never referenced at compile time).
    */
  val ProbeClass = "com.datastax.spark.connector.datasource.CassandraCatalog"

  def connectorAvailable: Boolean =
    try { Class.forName(ProbeClass, false, getClass.getClassLoader); true }
    catch { case _: ClassNotFoundException => false }
}
