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

  test("connectedComponentsStar equals pointer-jumping CC on random " +
    "graphs and on an adversarial long chain") {
    import graft.ops.{DedupOps, Graph}
    val rng = new scala.util.Random(23)
    val n = 80
    val rand = (0 until 100)
      .map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // high-diameter adversary: a 400-node path (plus a reversed tail so
    // edge direction never matters)
    val chain = (0L until 399L).map(i => (i + 1000L, i + 1001L))
    for (edges <- Seq(rand, chain)) {
      val df = edges.toDF("id_a", "id_b")
      val pj = DedupOps.connectedComponents(df)
        .as[(Long, Long)].collect().toMap
      val star = Graph.connectedComponentsStar(df)
        .as[(Long, Long)].collect().toMap
      assert(star === pj)
    }
    // the chain collapses to a single component rooted at its min
    val star = Graph.connectedComponentsStar(chain.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect()
    assert(star.map(_._2).distinct.toSeq === Seq(1000L))
    assert(star.length === 400)
  }
}
