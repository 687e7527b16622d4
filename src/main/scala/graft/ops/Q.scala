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
