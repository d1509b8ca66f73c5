package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms in pure DataFrame ops — the PageRank
  * companion to [[DedupOps.connectedComponents]]: corpus link-analysis
  * for source weighting (rank pretraining domains by citation structure)
  * without a graph framework dependency.
  *
  * Scale (100 TB of edges): each iteration is one shuffle join of the
  * rank vector against the edge list plus one groupBy — the same O(E)
  * per-pass shape GraphX/Pregel run, expressed relationally so AQE
  * handles skew and the edge frame's partitioning is reused across
  * iterations (persisted once). No driver-side graph, no collect.
  *
  * Determinism contract: per-node contribution sums run through a
  * TWO-LEVEL sorted fold (`array_sort` + `aggregate` within 4096
  * source-hash buckets, then over the sorted subtotals), so the IEEE
  * addition order is identical in any engine while no aggregation
  * buffer holds a hub node's whole in-neighborhood — DuckDB replays
  * iterations bit-for-bit
  * (choose a damping factor exactly representable in binary AND decimal
  * — 0.75, 0.5 — when oracle-gating, so literal folding agrees too).
  */
object Graph {

  /** `iters` rounds of damped PageRank over a directed edge list.
    * Per-node constant form: pr = (1−d) + d·Σ pr(u)/outdeg(u) (ranks
    * sum to N, not 1 — the per-page variant of Brin/Page; dangling mass
    * is dropped, documented standard for ranking use). Returns
    * `(node, pr)` for every node with at least one edge. */
  def pageRank(edges: DataFrame, src: String = "src", dst: String = "dst",
               iters: Int = 3, damping: Double = 0.75): DataFrame = {
    val nodes = Caches.small(
      edges.select(col(src).as("node"))
        .union(edges.select(col(dst).as("node"))).distinct())
    val outDeg = edges.groupBy(col(src).as("__u"))
      .agg(count(lit(1)).cast("double").as("__deg"))
    val e = Caches.small(
      edges.select(col(src).as("__u"), col(dst).as("__v"))
        .join(outDeg, "__u"))
    var pr = nodes.withColumn("pr", lit(1.0))
    for (_ <- 1 to iters) {
      // Two-level sorted fold: level 1 within 4096 source-hash buckets,
      // level 2 over the sorted bucket subtotals. A web-scale hub node's
      // in-degree is power-law-unbounded, so a single-level fold would
      // collect its whole in-neighborhood into one aggregation buffer;
      // bucketing caps every buffer at O(deg/4096) or O(4096) while the
      // summation order stays a pure function of the (source,
      // contribution) multiset — still bit-identical on any layout.
      // (For in-degree ≤ 2 the result is bitwise UNCHANGED vs the
      // single-level fold: IEEE addition of two doubles is commutative.)
      val l1 = e.join(pr, col("__u") === col("node"))
        .select(col("__v").as("node"),
          pmod(xxhash64(col("__u")), lit(4096)).as("__b"),
          (col("pr") / col("__deg")).as("__c"))
        .groupBy("node", "__b")
        .agg(aggregate(array_sort(collect_list(col("__c"))), lit(0.0),
          (a, x) => a + x).as("__sb"))
      val sums = l1.groupBy("node")
        .agg(aggregate(array_sort(collect_list(col("__sb"))), lit(0.0),
          (a, x) => a + x).as("__s"))
      pr = Caches.small(
        nodes.join(sums, Seq("node"), "left")
          .select(col("node"),
            (lit(1.0 - damping)
              + lit(damping) * coalesce(col("__s"), lit(0.0))).as("pr")))
    }
    pr
  }

  /** Normalize an edge frame to canonical undirected form: (a<b),
    * self-loops dropped, deduplicated. */
  private def canon(e: DataFrame): DataFrame =
    e.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .distinct()

  private def symm(e: DataFrame): DataFrame =
    e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the adversarial-graph companion to
    * [[DedupOps.connectedComponents]]'s pointer jumping.
    *
    * Why both exist: pointer jumping carries a LABEL TABLE (|V| rows)
    * through every round and joins it against the full edge list —
    * great when the graph is star/clique-shaped (near-dup graphs).
    * Star contraction instead REWRITES THE EDGE LIST toward a star per
    * component; its intermediate state shrinks monotonically on
    * high-diameter graphs (long chains, lattices, web-crawl tendrils),
    * converges in O(log n) alternations with per-round work O(|E|),
    * and needs no per-node label join. Per round: two groupBy-min's
    * and two key-equality joins — shuffle-partitioned, no broadcast of
    * anything data-sized, lineage truncated per round.
    *
    * Returns (node, component) with component = the component's minimum
    * node id — identical output contract to the pointer-jumping form
    * (equivalence property-tested in GraphSpec). */
  def connectedComponentsStar(pairs: DataFrame, idA: String = "id_a",
                              idB: String = "id_b",
                              maxIter: Int = 30): DataFrame = {
    // Convergence signature: (row count, order-independent hash XOR —
    // sound over these DISTINCT edge rows; wraps nothing under ANSI).
    // Equal edge sets ⇒ equal signatures, so a signature CHANGE proves
    // non-convergence with one cheap agg over the already-checkpointed
    // frame; only on signature EQUALITY do we run the authoritative
    // set-diff (once, at the converged round) — sound under hash
    // collisions, and one job per round instead of count+except every
    // round.
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("a"), col("b")))).head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var e = Caches.small(canon(
      pairs.select(col(idA).as("u"), col(idB).as("v"))))
    var eSig = sig(e)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // LARGE-STAR: per node u, m = min(N(u) ∪ {u}); connect every
      // strictly-larger neighbor to m
      val se = symm(e)
      val lsMin = se.groupBy("u").agg(min(col("v")).as("__mv"))
      val ls = canon(se.join(lsMin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), least(col("u"), col("__mv")).as("v")))
      // SMALL-STAR: per node u, m = min of its strictly-smaller
      // neighbors; connect those neighbors (and u) to m
      val ss0 = symm(ls)
      val smaller = ss0.filter(col("v") < col("u"))
      val ssMin = smaller.groupBy("u").agg(min(col("v")).as("__mv"))
      val ss = Caches.small(canon(
        smaller.join(ssMin, "u")
          .select(col("v").as("u"), col("__mv").as("v"))
          .unionByName(ssMin.select(col("u"), col("__mv").as("v")))))
      val ssSig = sig(ss)
      converged = ssSig == eSig && ss.except(e).isEmpty
      e = ss
      eSig = ssSig
      i += 1
    }
    // converged edge set is a star per component rooted at its min:
    // non-roots appear as `b` with the root as `a`; roots label themselves
    val members = e.select(col("b").as("node"), col("a").as("component"))
      .groupBy("node").agg(min("component").as("component"))
    val roots = e.select(col("a").as("node")).distinct()
      .join(members, Seq("node"), "left_anti")
      .withColumn("component", col("node"))
    members.unionByName(roots)
  }
}
