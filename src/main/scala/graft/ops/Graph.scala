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
  * sorted fold (`array_sort` + `aggregate`), so the IEEE addition order
  * is identical in any engine — DuckDB replays iterations bit-for-bit
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
      val sums = e.join(pr, col("__u") === col("node"))
        .select(col("__v").as("node"), (col("pr") / col("__deg")).as("__c"))
        .groupBy("node")
        .agg(aggregate(array_sort(collect_list(col("__c"))), lit(0.0),
          (a, x) => a + x).as("__s"))
      pr = Caches.small(
        nodes.join(sums, Seq("node"), "left")
          .select(col("node"),
            (lit(1.0 - damping)
              + lit(damping) * coalesce(col("__s"), lit(0.0))).as("pr")))
    }
    pr
  }
}
