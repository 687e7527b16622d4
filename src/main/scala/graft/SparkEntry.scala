package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from the SURVEY.md §2 inventory (and the LLM-pipeline
  * extensions) is registered here as a named query; those with ANSI-SQL
  * equivalents carry a DuckDB oracle for the driver's hash compare.
  */
object SparkEntry {

  /** All judged queries, grouped by module. */
  val all: Map[String, Q] =
    Relational.queries ++ Analytics.queries ++ Events.queries ++
      TextOps.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ CustomFns.queries ++ Joins.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the migration pipeline's global count-reconciliation (T6).
    */
  def entry(spark: SparkSession): DataFrame =
    all("t6_validate_counts").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Exposes Q.run
    * (not the raw fn): invoking any query first releases the previous
    * query's construction-time caches, so sweep runners (Verify, Bench,
    * the driver's gate) hold one query's cached state at a time.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.run }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql), _)) => k -> sql.stripMargin }
}
