package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CassandraToken

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions for SQL use. Attach with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * SQL surface:
  *   cassandra_token(key) — exact Cassandra Murmur3 partitioner token
  *     of a bigint/text/binary partition key (reference F1).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cassandraTokenDescriptor)
  }
}

object GraftExtensions {
  val cassandraTokenDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("cassandra_token"),
      new ExpressionInfo(classOf[CassandraToken].getName, "cassandra_token"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "cassandra_token takes exactly one argument")
        CassandraToken(children.head)
      })

  /** Register directly on an existing session (tests / REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = cassandraTokenDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
