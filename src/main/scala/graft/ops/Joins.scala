package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Join-shape coverage beyond the reference's single anti-join (SURVEY
  * §2.3 "free in Spark" row): semi join, non-equi range join, and an
  * event-time AS-OF join.
  *
  * The as-of join is the prompt's canonical "operator Spark lacks":
  * implemented by composition (preference (a) in SURVEY §7.3) — union the
  * probe and build sides tagged, then `last(value, ignoreNulls)` over an
  * event-time window per key. One shuffle on (key, time); no custom
  * physical operator needed. DuckDB's native ASOF JOIN is the oracle.
  */
object Joins {

  /** One PageRank superstep: annotate the N-row RANK table with out-
    * degree (rank ⋈ deg — both hash-partitioned on the node key, no
    * exchange), floor-divide once per NODE, join the per-node
    * contribution into the cached edge list on src, aggregate by dst,
    * damp. Integer millionths throughout — exact, order-independent,
    * hash-stable. Shared by j11's fixed-point loop AND
    * PlanQualitySpec's direct pin on an un-truncated single-superstep
    * build (the loop's localCheckpoint truncation hides iterations 1-2
    * from plan walkers; the shared body keeps the audited shape and
    * the executed shape one thing).
    *
    * Degree rides the rank table, NOT the edge list: the r15 sf10
    * ProfileQuery pass attributed 264 CPU-s to building a SECOND
    * 117M-row degree-annotated edge cache (plus 136 CPU-s for the
    * 36M-row degree partial shuffle off the unpartitioned cache) while
    * the three supersteps it amortized cost ~390 CPU-s total. Joining
    * deg into the 1.6M-row rank table per superstep costs ~1-2 CPU-s
    * an iteration and also moves the `rank div d` division from
    * per-edge (117M evaluations) to per-node (1.6M).
    */
  def pagerankSuperstep(edges: org.apache.spark.sql.DataFrame,
                        deg: org.apache.spark.sql.DataFrame,
                        rank: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val damp = 850000L; val base = 150000L; val unit = 1000000L
    val contrib = rank
      .join(deg, col("node") === deg("src"))
      .select(col("node"), expr("rank div d").as("cpe"))
    edges
      .join(contrib, edges("src") === contrib("node"))
      .select(col("dst"), col("cpe"))
      .groupBy("dst")
      .agg(sum(col("cpe")).as("in_sum"))
      .select(col("dst").as("node"),
              (lit(base) + expr(s"($damp * in_sum) div $unit")).as("rank"))
  }

  /** The checkpointed fixed-point loop shared by j11 and the 100x A/B
    * probe: `iters` supersteps with lineage truncation between them,
    * eager cleanup of the previous iteration's checkpoint blocks, and
    * registry-managed release of the last one (it backs the returned
    * lazy plan, so it must outlive construction; every runner's
    * beginQuery fires the cleanup).
    *
    * The i-1 checkpoint feeds ONLY the i-th materialization, so it is
    * dead the moment localCheckpoint(true) returns — but
    * Dataset.unpersist cannot reach an RDD-layer persist, so the blocks
    * otherwise linger until the ContextCleaner GCs the reference. The
    * persistent-RDD id diff around the eager checkpoint identifies the
    * blocks it created; that attribution is only exact when edgesD's
    * caches are materialized BEFORE the diff brackets — Dataset.persist
    * is lazy, and an unmaterialized cache would register its buffer
    * RDDs inside iteration 1's checkpoint job, putting the shared
    * caches into the cleanup set (a review caught exactly that:
    * iteration 2 destroyed the edge cache the persist exists to
    * amortize). The loop therefore materializes edgesD ITSELF as its
    * first step — a cheap cached scan for callers that already counted
    * — instead of trusting a caller-side contract that any new caller
    * could silently violate. PlanQualitySpec pins the behavior
    * end-to-end: after j11 executes, the shared caches are still live.
    */
  /** The FULL PageRank query body from a (c, sp) trade pair list to the
    * ranked top-20 frame — cache discipline, fixed-point loop, output
    * projection — shared verbatim by j11 and the layout A/B probe so
    * the measured variant can never silently diverge from the
    * registered query again (the probe once copied a stale loop and
    * biased the A/B it existed to adjudicate).
    *
    * Shape rationale (audited by PlanQualitySpec/ExchangeBudgetSpec):
    *  - edges explode from ONE pass over trades (Edges.symmetrize) —
    *    the union-of-two-projections form materialized the upstream
    *    join once per branch before the persist caught it.
    *  - ONE corpus-scale cache: the symmetrized edge list is hash-
    *    partitioned by src BEFORE the persist, so deg aggregates off
    *    the cache with ZERO exchange and every superstep join reads
    *    co-located edges. The r14-era shape held TWO 117M-row caches
    *    (raw edges + a degree-annotated copy, 2.65 GB resident at
    *    sf10) and paid a 36M-row degree partial shuffle plus a second
    *    cache build (264 CPU-s) — the r15 ProfileQuery pass measured
    *    the whole second cache as costing ~70% of what the three
    *    supersteps it served cost. Degree now rides the rank table
    *    per superstep (see pagerankSuperstep).
    *  - pagerankLoop truncates lineage between supersteps: constant
    *    plan depth, separate jobs, and the checkpoint's hash(node)
    *    partitioning lines up with the cached edge partitioning, so
    *    the superstep join needs no rank-side exchange. The truncation
    *    hides iterations 1-2 from plan walkers; the pins cover the
    *    final superstep plus the un-truncated shared body directly.
    */
  def pagerankRanked(s: org.apache.spark.sql.SparkSession,
                     trades: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    pagerankRanked(s, trades, sortedEdgeCache = true)

  /** `sortedEdgeCache` additionally sorts the src-partitioned edge cache
    * by src before the persist, so each superstep's sort-merge join reads
    * the corpus-scale edge side with zero exchange AND zero sort (the
    * same experiment as Dedup.clusterLabels — adjudicated by
    * tools/J11SortAB; the public overload's default is the winner:
    * r16 sf10 interleaved A/B, identical top-20 rows asserted, best-of-3 —
    * sorted cache won every round, 31.7 -> 26.9 s wall, 868 -> 727 CPU-s,
    * 41.9 -> 27.8 GB spill; shuffle unchanged at 3.27 GB since the
    * superstep exchange was already removed by the r15 repartition).
    */
  private[graft] def pagerankRanked(s: org.apache.spark.sql.SparkSession,
                     trades: org.apache.spark.sql.DataFrame,
                     sortedEdgeCache: Boolean): org.apache.spark.sql.DataFrame = {
    val unit = 1000000L
    val edgesPart = Edges.symmetrize(trades, col("c"), col("sp"))
      .repartition(col("src"))
    val edges =
      (if (sortedEdgeCache) edgesPart.sortWithinPartitions("src") else edgesPart).persist()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d")).persist()
    PipelineCache.retain(edges, deg)
    val rank0 = deg.select(col("src").as("node"), lit(unit).as("rank"))
    pagerankLoop(s, edges, deg, rank0, 3)
      .withColumn("kind", when(col("node") % 2 === 1, "supplier").otherwise("customer"))
      .withColumn("key", expr("node div 2"))
      .orderBy(col("rank").desc, col("node"))
      .select("kind", "key", "rank")
      .limit(20)
  }

  def pagerankLoop(s: org.apache.spark.sql.SparkSession,
                   edges: org.apache.spark.sql.DataFrame,
                   deg: org.apache.spark.sql.DataFrame,
                   rank0: org.apache.spark.sql.DataFrame,
                   iters: Int): org.apache.spark.sql.DataFrame = {
    deg.count() // materialize BOTH caches (deg builds off edges) before the diff brackets
    var rank = rank0
    var prevCpIds: Set[Int] = Set.empty
    for (i <- 1 to iters) {
      val next = pagerankSuperstep(edges, deg, rank)
      rank = if (i < iters) {
        val sc = s.sparkContext
        val before = sc.getPersistentRDDs.keySet.toSet
        val cp = next.localCheckpoint(true) // eager: materialized here
        val mine = sc.getPersistentRDDs.keySet.toSet -- before
        prevCpIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
        prevCpIds = mine
        cp
      } else next
    }
    val lastIds = prevCpIds
    PipelineCache.retainCleanup { () =>
      lastIds.foreach(id => s.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    }
    rank
  }

  val queries: Map[String, Q] = Map(

    // Semi join: orders having at least one high-value line (EXISTS).
    "j3_semi_join" -> Q(
      fn = (s, d) => {
        val big = Tables.lineitem(s, d)
          .where(col("l_extendedprice") > 80000).select("l_orderkey")
        Tables.orders(s, d)
          .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey").limit(500)
      },
      oracle = Some("""
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 80000)
        ORDER BY o_orderkey LIMIT 500"""),
      doc = "left_semi join (EXISTS)"
    ),

    // Non-equi range join: quantity tiers, broadcast nested-loop on a
    // tiny interval table (the broadcastable side makes BETWEEN joins
    // scale: the big side streams, never shuffles).
    "j4_range_join" -> Q(
      fn = (s, d) => {
        import s.implicits._
        val tiers = Seq(("t1_low", 0.0, 9.0), ("t2_mid", 10.0, 24.0),
                        ("t3_high", 25.0, 39.0), ("t4_top", 40.0, 50.0))
          .toDF("tier", "lo", "hi")
        Tables.lineitem(s, d)
          .join(broadcast(tiers),
                col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
          .groupBy("tier")
          .agg(count(lit(1)).as("n"),
               sum(col("l_quantity")).as("sum_qty"))
          .orderBy("tier")
      },
      oracle = Some("""
        WITH tiers(tier, lo, hi) AS (VALUES
          ('t1_low', 0.0, 9.0), ('t2_mid', 10.0, 24.0),
          ('t3_high', 25.0, 39.0), ('t4_top', 40.0, 50.0))
        SELECT tier, count(*) AS n, sum(l_quantity) AS sum_qty
        FROM lineitem JOIN tiers ON l_quantity >= lo AND l_quantity <= hi
        GROUP BY tier ORDER BY tier"""),
      doc = "non-equi interval join (broadcast)"
    ),

    // Scale path for range joins whose interval side outgrows broadcast:
    // BIN the domain (width 10 here), explode each interval into the bins
    // it covers, equi-join on the bin, then apply the exact bounds as a
    // residual predicate. Candidate volume is O(rows x bins-per-interval)
    // with a plain shuffled equi-join — no nested-loop. The oracle is the
    // plain non-equi join (same output as j4), proving the rewrite.
    "j8_binned_range_join" -> Q(
      fn = (s, d) => {
        import s.implicits._
        val BinW = 10.0
        val tiers = Seq(("t1_low", 0.0, 9.0), ("t2_mid", 10.0, 24.0),
                        ("t3_high", 25.0, 39.0), ("t4_top", 40.0, 50.0))
          .toDF("tier", "lo", "hi")
          .withColumn("bin", explode(sequence(
            floor(col("lo") / BinW).cast("long"), floor(col("hi") / BinW).cast("long"))))
        Tables.lineitem(s, d)
          .withColumn("bin", floor(col("l_quantity") / BinW).cast("long"))
          .join(tiers, Seq("bin"))
          .where(col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
          .groupBy("tier")
          .agg(count(lit(1)).as("n"),
               sum(col("l_quantity")).as("sum_qty"))
          .orderBy("tier")
      },
      oracle = Some("""
        WITH tiers(tier, lo, hi) AS (VALUES
          ('t1_low', 0.0, 9.0), ('t2_mid', 10.0, 24.0),
          ('t3_high', 25.0, 39.0), ('t4_top', 40.0, 50.0))
        SELECT tier, count(*) AS n, sum(l_quantity) AS sum_qty
        FROM lineitem JOIN tiers ON l_quantity >= lo AND l_quantity <= hi
        GROUP BY tier ORDER BY tier"""),
      doc = "range join via bin-explode equi-join (scale path; oracle = plain non-equi join)"
    ),

    // Skew-mitigation pattern: salted equi-join. The build side is
    // replicated across SALT buckets, the probe side's key is salted by a
    // deterministic hash — a hot key's rows spread over SALT reducer
    // partitions instead of one. Result is provably identical to the
    // plain join (the oracle IS the plain join).
    "j7_salted_join" -> Q(
      fn = (s, d) => {
        val Salt = 8
        val l = Tables.lineitem(s, d)
          .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(Salt)))
        val o = Tables.orders(s, d)
          .withColumn("salt", explode(lit((0 until Salt).toArray)))
        l.join(o, l("l_orderkey") === o("o_orderkey") && l("salt") === o("salt"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
               sum(col("l_quantity")).as("sum_qty"))
          .orderBy("o_orderpriority")
      },
      oracle = Some("""
        SELECT o_orderpriority, count(*) AS n, sum(l_quantity) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      doc = "salted join: skew mitigation, plain-join oracle"
    ),

    // AS-OF join via the engine's custom operator (LogicalPlan + Strategy
    // + streaming-merge SparkPlan, graft.plans.AsOfJoin) — same semantics
    // and same DuckDB ASOF oracle as j5's compositional form.
    "j6_asof_custom" -> Q(
      fn = (s, d) => {
        val ev = Tables.events(s, d).where(col("event_id") < 2000)
          .select("event_id", "event_type", "ts")
        val dim = Tables.events(s, d).where(col("event_id") % 97 === 0)
          .groupBy(col("event_type").as("r_type"), col("ts").as("rate_ts"))
          .agg(max(col("value")).as("rate"))
        graft.plans.AsOfJoinApi.asofJoin(s, ev, dim, "event_type", "ts", "r_type", "rate_ts")
          .select("event_id", "event_type", "ts", "rate_ts", "rate")
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH dim AS (
          SELECT event_type, ts AS rate_ts, max(value) AS rate
          FROM events WHERE event_id % 97 = 0 GROUP BY event_type, ts)
        SELECT e.event_id, e.event_type, e.ts, d.rate_ts, d.rate
        FROM events e ASOF LEFT JOIN dim d
          ON e.event_type = d.event_type AND e.ts >= d.rate_ts
        WHERE e.event_id < 2000 ORDER BY e.event_id"""),
      doc = "as-of join as custom LogicalPlan/Strategy/SparkPlan"
    ),

    // AS-OF join: enrich each event with the most recent prior "rate"
    // observation of its type (rates = every 97th event). Composition:
    // tagged union + last-non-null over (key, time) window; ties at equal
    // ts resolve dim-first so the match is inclusive (rate_ts <= ts),
    // matching DuckDB's ASOF ON e.ts >= d.rate_ts.
    "j5_asof_join" -> Q(
      fn = (s, d) => {
        val ev = Tables.events(s, d)
        val dim = ev.where(col("event_id") % 97 === 0)
          .groupBy(col("event_type"), col("ts").as("rate_ts"))
          .agg(max(col("value")).as("rate"))
        val evTagged = ev.select(
          col("event_type"), col("ts"), lit(1).as("is_event"), col("event_id"),
          lit(null).cast("timestamp").as("r_ts"), lit(null).cast("double").as("r"))
        val dimTagged = dim.select(
          col("event_type"), col("rate_ts").as("ts"), lit(0).as("is_event"),
          lit(-1L).as("event_id"), col("rate_ts").as("r_ts"), col("rate").as("r"))
        val w = Window.partitionBy("event_type")
          .orderBy(col("ts"), col("is_event"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        evTagged.union(dimTagged)
          .withColumn("rate_ts", last(col("r_ts"), ignoreNulls = true).over(w))
          .withColumn("rate", last(col("r"), ignoreNulls = true).over(w))
          .where(col("is_event") === 1 && col("event_id") < 2000)
          .select("event_id", "event_type", "ts", "rate_ts", "rate")
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH dim AS (
          SELECT event_type, ts AS rate_ts, max(value) AS rate
          FROM events WHERE event_id % 97 = 0 GROUP BY event_type, ts)
        SELECT e.event_id, e.event_type, e.ts, d.rate_ts, d.rate
        FROM events e ASOF LEFT JOIN dim d
          ON e.event_type = d.event_type AND e.ts >= d.rate_ts
        WHERE e.event_id < 2000 ORDER BY e.event_id"""),
      doc = "as-of join by composition (tagged union + event-time window)"
    ),

    // J9 — snapshot diff report: the reference's end-of-migration "diff 0"
    // check generalized from counts to CONTENT — full outer join on the
    // key, null-safe column compare, one classified count per key state.
    // One keyed shuffle; at 100 TB both snapshots co-partition on pk and
    // nothing but the 3-row report leaves the executors. The "target" is
    // a deterministic corruption of the source (rows dropped at pk%97,
    // prices bumped at pk%13) so every class is non-empty.
    "j9_snapshot_diff" -> Q(
      fn = (s, d) => {
        def snap = Tables.orders(s, d).select(
          col("o_orderkey").as("pk"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("price"),
          col("o_orderstatus").as("status"))
        val src = snap
        val tgt = snap.where(col("pk") % 97 =!= 0)
          .withColumn("price",
            when(col("pk") % 13 === 0, col("price") + lit(1).cast(DecimalType(18, 2)))
              .otherwise(col("price")))
          .select(col("pk").as("t_pk"), col("price").as("t_price"), col("status").as("t_status"))
        src.join(tgt, col("pk") === col("t_pk"), "full_outer")
          .select(
            when(col("t_pk").isNull, "missing_in_target")
              .when(col("pk").isNull, "extra_in_target")
              .when(col("price") <=> col("t_price") && col("status") <=> col("t_status"),
                    "unchanged")
              .otherwise("changed").as("diff_class"))
          .groupBy("diff_class").agg(count(lit(1)).as("n"))
          .orderBy("diff_class")
      },
      oracle = Some("""
        WITH src AS (
          SELECT o_orderkey AS pk, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
                 o_orderstatus AS status
          FROM orders),
        tgt AS (
          SELECT pk, CASE WHEN pk % 13 = 0 THEN price + CAST(1 AS DECIMAL(18,2))
                          ELSE price END AS price, status
          FROM src WHERE pk % 97 <> 0)
        SELECT CASE WHEN t.pk IS NULL THEN 'missing_in_target'
                    WHEN s.pk IS NULL THEN 'extra_in_target'
                    WHEN s.price IS NOT DISTINCT FROM t.price
                     AND s.status IS NOT DISTINCT FROM t.status THEN 'unchanged'
                    ELSE 'changed' END AS diff_class,
               count(*) AS n
        FROM src s FULL OUTER JOIN tgt t ON s.pk = t.pk
        GROUP BY diff_class ORDER BY diff_class"""),
      doc = "content-level snapshot diff: full outer join + null-safe compare"
    ),

    // J10 — Bloom-pruned semi join: the big side is filtered during its
    // own scan by an 8 KiB bitset built from the dim side (one literal in
    // the plan), so at 100 TB the non-matching ~80% of orders never
    // reaches the join. Bloom FPs are absorbed by the exact semi join
    // that follows, so the result — and the oracle — is exactly the
    // plain semi join. The semi join carries no broadcast hint: the dim
    // side is customer-scaled (grows with SF), so AQE picks the strategy
    // from the runtime size instead of a forced replication.
    "j10_bloom_prune" -> Q(
      fn = (s, d) => {
        val dim = Tables.customer(s, d)
          .where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val bloom = graft.functions.PortableBloom.build(dim, "c_custkey")
        Tables.orders(s, d)
          .where(graft.functions.PortableBloom.mightContain(col("o_custkey"), bloom))
          .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
          .agg(count(lit(1)).as("n_orders"),
               sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
      },
      oracle = Some("""
        SELECT count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')"""),
      doc = "bloom-filter pre-pruned semi join (portable runtime filter)"
    ),

    // Fixed-point PageRank over the customer-supplier trade graph — the
    // iterative-graph-compute shape (domain ranking for crawl curation is
    // the 100 TB analog). All arithmetic is integer millionths with floor
    // division, so every iteration is EXACT and order-independent: no
    // float accumulation, hash-stable across engines and partitionings.
    // Each iteration is one equi-join of (node, rank) against the cached
    // degree-annotated edge list + one keyed aggregation — the Pregel
    // superstep as DataFrames. The edge table is hash-partitioned by src
    // once before caching, so supersteps shuffle only rank + contribs.
    "j11_pagerank" -> Q(
      fn = (s, d) => {
        // undirected bipartite trade graph: customer 2k <-> supplier 2k+1
        val trades = Tables.orders(s, d)
          .join(Tables.lineitem(s, d),
                col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("c"),
                  (col("l_suppkey") * 2 + 1).as("sp"))
          .distinct()
        pagerankRanked(s, trades)
      },
      oracle = Some("""
        WITH trades AS (
          SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS sp
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (
          SELECT c AS src, sp AS dst FROM trades
          UNION ALL SELECT sp, c FROM trades),
        deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
        r1 AS (
          SELECT e.dst AS node,
                 150000 + (850000 * sum(r.rank // g.d)) // 1000000 AS rank
          FROM edges e JOIN r0 r ON e.src = r.node JOIN deg g ON e.src = g.src
          GROUP BY e.dst),
        r2 AS (
          SELECT e.dst AS node,
                 150000 + (850000 * sum(r.rank // g.d)) // 1000000 AS rank
          FROM edges e JOIN r1 r ON e.src = r.node JOIN deg g ON e.src = g.src
          GROUP BY e.dst),
        r3 AS (
          SELECT e.dst AS node,
                 150000 + (850000 * sum(r.rank // g.d)) // 1000000 AS rank
          FROM edges e JOIN r2 r ON e.src = r.node JOIN deg g ON e.src = g.src
          GROUP BY e.dst)
        SELECT CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END AS kind,
               node // 2 AS key, CAST(rank AS BIGINT) AS rank
        FROM r3 ORDER BY rank DESC, node LIMIT 20"""),
      doc = "fixed-point integer PageRank over the trade graph (Pregel-as-DataFrames)"
    ),

    // Triangle counting over the nation-level trade graph (edge a—b iff
    // some order ships from a customer in nation a to a supplier in
    // nation b). Compact-forward enumeration: edges stored once with
    // a < b, so each triangle (a,b,c) with a<b<c is produced by exactly
    // one path join — no per-triangle dedup pass. The edge list is built
    // once and reused across all three join legs (cached); both joins are
    // equi-joins on node ids, so at scale the shuffle carries only long
    // pairs and degree-ordered relabeling bounds the hot-vertex skew.
    "j12_triangle_count" -> Q(
      fn = (s, d) => {
        val trade = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .select(least(col("c_nationkey"), col("s_nationkey")).as("a"),
                  greatest(col("c_nationkey"), col("s_nationkey")).as("b"))
          .where(col("a") < col("b"))
          .distinct()
          .persist()
        PipelineCache.retain(trade)
        val tri = trade.as("e1")
          .join(trade.as("e2"), col("e1.b") === col("e2.a"))
          .join(trade.as("e3"),
                col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
          .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
        tri.select(explode(array(col("x"), col("y"), col("z"))).as("nk"))
          .groupBy("nk").agg(count(lit(1)).as("n_triangles"))
          .join(Tables.nation(s, d), col("nk") === col("n_nationkey"))
          .select(col("n_name"), col("n_triangles"))
          .orderBy(col("n_triangles").desc, col("n_name"))
      },
      oracle = Some("""
        WITH trade AS (
          SELECT DISTINCT least(c_nationkey, s_nationkey) AS a,
                          greatest(c_nationkey, s_nationkey) AS b
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          WHERE c_nationkey <> s_nationkey),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM trade e1
          JOIN trade e2 ON e1.b = e2.a
          JOIN trade e3 ON e1.a = e3.a AND e2.b = e3.b),
        members AS (
          SELECT x AS nk FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
        SELECT n_name, count(*) AS n_triangles
        FROM members JOIN nation ON nk = n_nationkey
        GROUP BY n_name
        ORDER BY n_triangles DESC, n_name"""),
      doc = "per-nation triangle participation in the trade graph (compact-forward)"
    )
  )
}
