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
    // through GraftExtensions). DuckDB has no Cassandra-variant
    // Murmur3_x64_128, so the oracle carries the expected tokens for every
    // possible key (0..19) as a literal VALUES plane — generated from the
    // same cross-language vectors the CassandraMurmur3Spec pins — joined
    // against the data-derived id set, so the driver hash-gates the
    // expression output instead of a rows-only count.
    "f2_token_cassandra" -> Q(
      fn = (s, d) => {
        GraftExtensions.register(s)
        Tables.orders(s, d).where(col("o_orderkey") < 20)
          .select(col("o_orderkey").as("id"),
                  cassandra_token(col("o_orderkey")).as("token_bigint"),
                  cassandra_token(col("o_orderkey").cast("string")).as("token_text"))
          .orderBy("id")
      },
      oracle = Some("""
        WITH toks(id, token_bigint, token_text) AS (VALUES
          (0, 2945182322382062539, 3083240331115144064),
          (1, 6292367497774912474, 8213365047359667313),
          (2, -8218881827949364593, 5293579765126103566),
          (3, -8048510690352527683, -155496620801056360),
          (4, 1830508272351686621, -663977588974966463),
          (5, 4464361019114304900, 958005880272148645),
          (6, 6268297055439790106, -8982230457741691068),
          (7, -5038316157564330072, -2540966642987085542),
          (8, 3989579132296173906, 3561637668096805189),
          (9, -2638303903097405552, -1621523823236117896),
          (10, 1944024169073138009, -1297921881139976049),
          (11, 3109524872961303651, 8061178154297884044),
          (12, -6030257681769843457, 5355690773644049813),
          (13, -5222276830576067764, -4525396453480898112),
          (14, 3421398847698307239, 3236311035481889723),
          (15, -3520484983264228142, -1312913849834392428),
          (16, -6388174459908673966, -8086700419620808463),
          (17, 8660407606519473992, -2253424581619911583),
          (18, 7599759837043657056, 2696114032539594655),
          (19, -8829757208421597067, -4943771816855955354)),
        ids AS (SELECT DISTINCT o_orderkey AS id FROM orders WHERE o_orderkey < 20)
        SELECT CAST(i.id AS BIGINT) AS id,
               CAST(t.token_bigint AS BIGINT) AS token_bigint,
               CAST(t.token_text AS BIGINT) AS token_text
        FROM ids i JOIN toks t ON t.id = i.id ORDER BY id"""),
      doc = "exact Cassandra Murmur3 token expression (codegen), hash-gated via literal token plane"
    )
  )
}
