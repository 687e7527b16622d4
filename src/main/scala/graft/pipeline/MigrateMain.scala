package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.GraftExtensions
import graft.core.Tokens
import graft.functions.CassandraToken

/** CLI driver for the migration pipeline — the reference's
  * SnapshotConfig + main() surface (snapshot_use_pyspark.py:26-46,
  * 404-468) as arguments:
  *
  *   runMain graft.pipeline.MigrateMain \
  *     --src /path/src.parquet --key o_orderkey --ranges 64 \
  *     --sink /path/sink --checkpoints /path/cp \
  *     [--rename o_orderkey=file_id[,a=b...]] [--passes 3] \
  *     [--jdbc-url jdbc:... --jdbc-user u --jdbc-password p \
  *      --jdbc-table t --jdbc-key-cols id --jdbc-wal migration_wal]
  *
  * With --jdbc-url the sink and checkpoint store bind to the database
  * (JdbcTableSink + JdbcCheckpoints + K5 bootstrap); otherwise the
  * parquet bindings are used. Exit code 0 iff validation says OK.
  *
  * With --cassandra-keyspace/--cassandra-table (and optionally
  *  --cassandra-host, default 127.0.0.1) the SOURCE binds to the
  * jar-gated Spark Cassandra connector instead of --src, and the token
  * function switches to the exact Murmur3 `cassandra_token` over the
  * full signed-64 ring, so checkpoint ranges align with the server's
  * Murmur3Partitioner — the reference's Cassandra->MySQL shape end to
  * end (tools/cassandra_conformance.sh is the deploy gate).
  */
object MigrateMain {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    def req(k: String): String =
      a.getOrElse(k, sys.error(s"missing required --$k"))

    val spark = SparkSession.builder()
      .master(a.getOrElse("master", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .appName("graft-migrate")
      .config("spark.sql.shuffle.partitions", a.getOrElse("shuffle-partitions", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()

    try {
      val renames = a.get("rename").map(_.split(',').map { kv =>
        val Array(f, t) = kv.split('='); f -> t
      }.toMap).getOrElse(Map.empty)

      val cassandra = a.get("cassandra-keyspace").map { ks =>
        CassandraSource(ks, req("cassandra-table"),
          Map("spark.cassandra.connection.host" ->
            a.getOrElse("cassandra-host", "127.0.0.1")))
      }
      // schema for sink bootstrap comes from whichever source is bound
      def srcDf = cassandra.map(_.read(spark))
        .getOrElse(spark.read.parquet(req("src")))

      val jdbc = a.get("jdbc-url").map { url =>
        val cfg = JdbcSink.JdbcConfig(
          url = url,
          user = a.getOrElse("jdbc-user", ""),
          password = a.getOrElse("jdbc-password", ""),
          table = req("jdbc-table"),
          columns = a.get("jdbc-columns").map(_.split(',').toSeq).getOrElse(Seq.empty),
          keyCols = req("jdbc-key-cols").split(',').toSeq,
          dialect = if (url.startsWith("jdbc:derby")) DerbyDialect else MySqlDialect,
          walTable = a.get("jdbc-wal"))
        cfg
      }

      val cfg = MigrateConfig(
        srcPath = if (cassandra.isDefined) a.getOrElse("src", "") else req("src"),
        keyCol = req("key"),
        numRanges = a.getOrElse("ranges", "64").toInt,
        sinkPath = a.getOrElse("sink", ""),
        checkpointPath = a.getOrElse("checkpoints", ""),
        renames = renames,
        tokenFn = if (cassandra.isDefined) CassandraToken.cassandra_token
                  else Tokens.tokenOracle,
        ringMin = if (cassandra.isDefined) Tokens.RingMin else Tokens.OracleRingMin,
        ringMax = if (cassandra.isDefined) Tokens.RingMax else Tokens.OracleRingMax,
        source = cassandra,
        sink = jdbc.map { j =>
          // bootstrap (K5) before binding the sink
          val src = srcDf
          val renamedSchema = org.apache.spark.sql.types.StructType(
            src.schema.fields.map(f =>
              f.copy(name = renames.getOrElse(f.name, f.name))) :+
              org.apache.spark.sql.types.StructField("range_id",
                org.apache.spark.sql.types.LongType))
          val columns =
            if (j.columns.nonEmpty) j.columns else renamedSchema.fields.map(_.name).toSeq
          val conn = java.sql.DriverManager.getConnection(j.url, j.user, j.password)
          try Ddl.ensureTables(conn, j.dialect, j.table,
            org.apache.spark.sql.types.StructType(
              renamedSchema.fields.filter(f => columns.contains(f.name))),
            j.keyCols)
          finally conn.close()
          JdbcTableSink(j.copy(columns = columns))
        },
        checkpoints = jdbc.map(j =>
          new JdbcCheckpoints(j.url, j.user, j.password, dialect = j.dialect)))

      val m = new Migrate(spark, cfg)
      m.run(a.getOrElse("passes", "3").toInt)
      val v = m.validate()
      // one parseable result line, like the reference's final log
      println(s"""{"table":"${v.table_name}","src":${v.src_count},"dst":${v.dst_count},"diff":${v.diff},"status":"${v.status}"}""")
      if (v.status != "OK") sys.exit(2)
    } finally spark.stop()
  }
}
