package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** NULL-sanitization transform — reference P7 (snapshot_use_pyspark.py:241-255):
  * per-column policy applied between scan and sink:
  *   - NOT-NULL string columns  -> NULL becomes ""
  *   - numeric columns          -> NULL kept
  *   - NOT-NULL timestamp cols  -> NULL becomes a default timestamp
  *     (the reference uses now(); tests pin a fixed default so results are
  *     deterministic for the oracle — SURVEY.md §7.4 determinism note).
  *
  * Expressed as coalesce so Catalyst folds it into the scan projection
  * (stays inside whole-stage codegen; no UDF).
  */
object Sanitize {

  final case class NullPolicy(
      emptyStringCols: Seq[String] = Seq.empty,
      keepNullCols: Seq[String] = Seq.empty,
      timestampDefaultCols: Map[String, String] = Map.empty // col -> literal ts "yyyy-MM-dd HH:mm:ss"
  )

  /** The reference `files`-table policy (snapshot_use_pyspark.py:245-253),
    * with the timestamp default pinned.
    */
  val filesPolicy: NullPolicy = NullPolicy(
    emptyStringCols = Seq("client_name", "client_zone", "fid", "name"),
    keepNullCols = Seq("cluster", "duration", "ext", "mime", "size", "type", "height", "width"),
    timestampDefaultCols = Map("modified" -> "2025-01-01 00:00:00")
  )

  def sanitize(df: DataFrame, policy: NullPolicy): DataFrame = {
    val cols: Seq[Column] = df.columns.toSeq.map { c =>
      if (policy.emptyStringCols.contains(c))
        coalesce(col(c), lit("")).as(c)
      else
        policy.timestampDefaultCols.get(c) match {
          case Some(ts) => coalesce(col(c), to_timestamp(lit(ts))).as(c)
          case None     => col(c) // keep-NULL columns pass through untouched
        }
    }
    df.select(cols: _*)
  }
}
