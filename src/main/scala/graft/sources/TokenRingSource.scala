package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.Tokens
import graft.core.Tokens.TokenRange

/** Custom DataSource V2: the token ring as a first-class connector.
  *
  * This is the reference's S1/S2 contract ("each scan IS a token range",
  * snapshot_use_pyspark.py:216-234) expressed the way a real Spark
  * connector expresses it — the same shape the Cassandra connector uses:
  *
  *  - one Spark InputPartition PER TOKEN RANGE (`planInputPartitions`),
  *    so range parallelism is the source's own partitioning, not a
  *    derived column filter;
  *  - predicate pushdown on `range_id` (=, IN, <, <=, >, >=) PRUNES
  *    PARTITIONS before they are ever scheduled — a range filter reads
  *    exactly its ranges, the planner never sees the rest;
  *  - column pruning via `pruneColumns` — the reader materializes only
  *    requested fields.
  *
  * Usage:
  *   spark.read.format("graft.sources.TokenRingSource")
  *     .option("numRanges", 64).load()
  *
  * Options: numRanges (required), ringMin/ringMax (default: oracle ring).
  */
class TokenRingSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TokenRingSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    // properties keep the caller's key case — normalize for lookup
    new TokenRingTable(properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap)

  override def supportsExternalMetadata(): Boolean = false
}

object TokenRingSource {
  val Schema: StructType = StructType(Seq(
    StructField("range_id", LongType, nullable = false),
    StructField("range_start", LongType, nullable = false),
    StructField("range_end", LongType, nullable = false)))
}

private[sources] class TokenRingTable(props: Map[String, String])
    extends Table with SupportsRead {

  private val numRanges = props.getOrElse("numranges",
    sys.error("TokenRingSource requires option numRanges")).toInt
  private val ringMin = props.get("ringmin").map(_.toLong).getOrElse(Tokens.OracleRingMin)
  private val ringMax = props.get("ringmax").map(_.toLong).getOrElse(Tokens.OracleRingMax)

  override def name(): String = s"token_ring($numRanges)"
  override def schema(): StructType = TokenRingSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TokenRingScanBuilder(Tokens.split(numRanges, ringMin, ringMax))
}

private[sources] class TokenRingScanBuilder(allRanges: Seq[TokenRange])
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = TokenRingSource.Schema

  /** range_id predicates prune partitions source-side; everything else is
    * left to Spark (returned as not-handled).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition {
      case EqualTo("range_id", _) | In("range_id", _) |
           GreaterThan("range_id", _) | GreaterThanOrEqual("range_id", _) |
           LessThan("range_id", _) | LessThanOrEqual("range_id", _) => true
      case _ => false
    }
    pushed = handled
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def keep(r: TokenRange): Boolean = pushed.forall {
    case EqualTo("range_id", v: Any) => r.rangeId.toLong == v.asInstanceOf[Number].longValue()
    case In("range_id", vs) => vs.exists(v => r.rangeId.toLong == v.asInstanceOf[Number].longValue())
    case GreaterThan("range_id", v) => r.rangeId.toLong > v.asInstanceOf[Number].longValue()
    case GreaterThanOrEqual("range_id", v) => r.rangeId.toLong >= v.asInstanceOf[Number].longValue()
    case LessThan("range_id", v) => r.rangeId.toLong < v.asInstanceOf[Number].longValue()
    case LessThanOrEqual("range_id", v) => r.rangeId.toLong <= v.asInstanceOf[Number].longValue()
    case _ => true
  }

  override def build(): Scan =
    new TokenRingScan(allRanges.filter(keep), required)
}

private[sources] class TokenRingScan(ranges: Seq[TokenRange], required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TokenRingScan(${ranges.size} ranges after pruning)"

  override def planInputPartitions(): Array[InputPartition] =
    ranges.map(r => TokenRangePartition(r.rangeId.toLong, r.start, r.end): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new TokenRangeReaderFactory(required.fieldNames)
}

private[sources] final case class TokenRangePartition(rangeId: Long, start: Long, end: Long)
    extends InputPartition

private[sources] class TokenRangeReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TokenRangePartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "range_id" => p.rangeId
          case "range_start" => p.start
          case "range_end" => p.end
        })
      override def close(): Unit = ()
    }
  }
}
