package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression for the exact Cassandra Murmur3 token (reference F1).
  *
  * Stays inside whole-stage codegen: doGenCode emits a direct static call
  * into [[CassandraMurmur3]] — no boxing, no UDF serialization, null-safe
  * via UnaryExpression's nullSafeCodeGen. Accepts bigint (8-byte big-endian
  * serialization, Cassandra `bigint` keys) or string/binary (UTF-8 bytes,
  * Cassandra `text`/`blob` keys).
  */
case class CassandraToken(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cassandra_token expects bigint, string, or binary, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType   => CassandraMurmur3.tokenOfLong(input.asInstanceOf[Long])
    case StringType => CassandraMurmur3.tokenOfBytes(input.asInstanceOf[UTF8String].getBytes)
    case BinaryType => CassandraMurmur3.tokenOfBytes(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[CassandraMurmur3.type].getName.stripSuffix("$") + "$.MODULE$"
    child.dataType match {
      case LongType =>
        defineCodeGen(ctx, ev, c => s"$m.tokenOfLong($c)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$m.tokenOfBytes($c.getBytes())")
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"$m.tokenOfBytes($c)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CassandraToken =
    copy(child = newChild)

  override def prettyName: String = "cassandra_token"
}

object CassandraToken {
  /** Column API: exact Cassandra Murmur3 token of a partition key.
    * Resolves through the session function registry — call
    * [[graft.GraftExtensions.register]] (or attach the extensions class)
    * on the session first.
    */
  def cassandra_token(c: Column): Column =
    org.apache.spark.sql.functions.call_function("cassandra_token", c)
}
