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
) {
  /** The invocation every runner (Verify/Bench/tools/tests via
    * SparkEntry.queries) should use: releases the PREVIOUS query's
    * construction-time caches before building this one, so a long
    * single-JVM sweep holds exactly one query's worth of cached state
    * at a time instead of accumulating 180 queries' persists.
    */
  val run: (SparkSession, String) => DataFrame =
    (s, d) => { PipelineCache.beginQuery(); fn(s, d) }
}

/** Shared plan-shape helpers for the graph-flavored queries. */
object Edges {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{array, col, explode, struct}

  /** Symmetrize a directed pair list into an undirected edge list in ONE
    * pass: explode each row into both directions. The union-of-two-
    * projections alternative scans — and, when the input is not
    * persisted, fully recomputes — the upstream pair pipeline once per
    * branch; this shape is pinned by PlanQualitySpec (single source scan,
    * no Union).
    */
  def symmetrize(pairs: DataFrame, a: Column, b: Column): DataFrame =
    pairs
      .select(explode(array(
        struct(a.as("src"), b.as("dst")),
        struct(b.as("src"), a.as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
}

/** Registry for DataFrames that a query persists at CONSTRUCTION time but
  * that must stay cached until the (lazy) result executes: an in-query
  * `finally unpersist` would release the cache before the first action
  * runs. Discipline: every construction-time `persist()` is immediately
  * `retain`ed here; the NEXT query's `Q.run` (or an explicit `release()`
  * from Verify/Bench) unpersists everything retained — so repeated sweep
  * loops hold exactly one query's worth of cached state, and a runner can
  * assert `cacheManager.isEmpty` after `release()` at exit.
  *
  * `retain` APPENDS (a query may persist several frames, including via
  * shared helpers like Dedup.minhashPortable); `release` drops them all.
  */
object PipelineCache {
  private val lock = new Object
  private var held: Vector[DataFrame] = Vector.empty
  private var cleanups: Vector[() => Unit] = Vector.empty
  def retain(dfs: DataFrame*): Unit = lock.synchronized { held ++= dfs }
  /** Register a release-time cleanup for cached state `Dataset.unpersist`
    * cannot reach — localCheckpoint RDDs in particular persist at the RDD
    * layer, invisible to the CacheManager, and otherwise linger until the
    * ContextCleaner happens to GC the reference (j11's supersteps held
    * MEMORY_AND_DISK blocks across a whole sweep that way).
    *
    * CONTRACT: unlike plain `unpersist` of a lineage-backed frame, these
    * cleanups are NOT recompute-safe. A local checkpoint DISCARDS lineage,
    * so a DataFrame built over one (j11's pagerankLoop) fails permanently
    * with "checkpoint block not found" if executed — or re-executed —
    * after its cleanup ran. Consumers must fully execute a query's result
    * before the next `beginQuery()`/`release()`; build-all-then-execute
    * over this registry is unsound by design.
    */
  def retainCleanup(f: () => Unit): Unit = lock.synchronized { cleanups :+= f }
  /** Cached-state registrations the most recent query left behind:
    * construction-time persists PLUS RDD-layer checkpoint cleanups
    * (retainCleanup) — both mean the query's timing includes building
    * shared cached state that per-query hygiene releases between queries.
    * Bench reads this after each query to flag which timings include such
    * a (re)build, so the judge can separate honest cold-cache cost from
    * plan regression.
    */
  def heldCount: Int = lock.synchronized(held.size + cleanups.size)
  def beginQuery(): Unit = release()
  def release(): Unit = {
    val (toDrop, toRun) = lock.synchronized {
      val h = (held, cleanups); held = Vector.empty; cleanups = Vector.empty; h
    }
    // Unpersisting a PERSISTED frame another consumer still reads is
    // recompute-safe (Spark falls back to lineage), so the lock covers
    // bookkeeping only. The cleanups are NOT: they drop localCheckpoint
    // RDD blocks whose lineage is gone (see retainCleanup's contract), so
    // any result built before this release must already be fully executed.
    toDrop.foreach(_.unpersist())
    toRun.foreach(f => try f() catch { case _: Exception => () })
  }
}
