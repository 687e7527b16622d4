package graft.ops

import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.core.Tables
import graft.functions.CassandraToken.cassandra_token

/** Queries exercising the engine's custom Catalyst expressions. */
object CustomFns {

  val queries: Map[String, Q] = Map(

    // F1 exact parity: Cassandra Murmur3 partitioner tokens for bigint and
    // text keys, via the codegen'd CassandraToken expression (registered
    // through GraftExtensions). No oracle: DuckDB has no Cassandra-variant
    // Murmur3_x64_128; exactness is covered by unit tests instead.
    "f2_token_cassandra" -> Q(
      fn = (s, d) => {
        GraftExtensions.register(s)
        Tables.orders(s, d).where(col("o_orderkey") < 20)
          .select(col("o_orderkey").as("id"),
                  cassandra_token(col("o_orderkey")).as("token_bigint"),
                  cassandra_token(col("o_orderkey").cast("string")).as("token_text"))
          .orderBy("id")
      },
      oracle = None,
      doc = "exact Cassandra Murmur3 token expression (codegen)"
    )
  )
}
