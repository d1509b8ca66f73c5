package graft

import graft.ops.Graph

/** PageRank in DataFrame ops: hand-checked fixpoint + determinism. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: hand-computed star graph (a->c, b->c) reaches its " +
    "fixpoint values") {
    val edges = Seq(("a", "c"), ("b", "c")).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 3, damping = 0.75)
      .as[(String, Double)].collect().toMap
    // sources never receive mass: (1-d) = 0.25 from iteration 1 on;
    // c's fixpoint: 0.25 + 0.75*(0.25 + 0.25) = 0.625
    assert(got("a") === 0.25 && got("b") === 0.25)
    assert(got("c") === 0.625)
  }

  test("pageRank: partition-count invariant (sorted-fold sums) and " +
    "more-linked nodes rank higher") {
    val edges = (1L to 60L).flatMap { i =>
      Seq((i, 100L), (i, if (i % 2 == 0) 101L else 100L))
    }.toDF("src", "dst")
    val a = Graph.pageRank(edges.repartition(3), iters = 3)
      .as[(Long, Double)].collect().toMap
    val b = Graph.pageRank(edges.repartition(11), iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(a === b)
    assert(a(100L) > a(101L)) // 90 in-links vs 30
  }
}
