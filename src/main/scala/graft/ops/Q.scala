package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One judged query: the Spark implementation plus (when SQL-expressible)
  * the equivalent ANSI/DuckDB SQL the driver's oracle runs on the same
  * parquet tables. Oracle absent => driver records a weaker rows-only check.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = ""
)

/** One-slot cache for DataFrames that a query persists at CONSTRUCTION
  * time but that must stay cached until the (lazy) result executes: an
  * in-query `finally unpersist` would release the cache before the first
  * action runs. Each query run swaps its persisted frames in, releasing
  * the previous run's — so repeated Verify/Bench loops hold exactly one
  * query's worth of cached state.
  */
object PipelineCache {
  private val lock = new Object
  private var last: Seq[DataFrame] = Nil
  def swap(next: DataFrame*): Unit = lock.synchronized {
    last.foreach(_.unpersist())
    last = next.toIndexedSeq
  }
}
