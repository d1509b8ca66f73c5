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

  test("triangleCount matches brute-force enumeration on random graphs " +
    "and ignores direction/duplicates/self-loops") {
    val rng = new scala.util.Random(7)
    val n = 40
    val raw = (0 until 220)
      .map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
    // brute force over the canonical simple graph
    val und = raw.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val expect = scala.collection.mutable.Map.empty[Long, Long]
    for {
      Seq(x, y, z) <- nodes.combinations(3)
      if und((x, y)) && und((y, z)) && und((x, z))
      v <- Seq(x, y, z)
    } expect(v) = expect.getOrElse(v, 0L) + 1L
    // feed the RAW edges (directed, duplicated, self-looped)
    val got = Graph.triangleCount(raw.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got === expect.toMap)
    // partition invariance
    val got11 = Graph.triangleCount(raw.toDF("src", "dst").repartition(11))
      .as[(Long, Long)].collect().toMap
    assert(got11 === expect.toMap)
  }

  test("sssp: weighted distances prefer the cheap long way round, " +
    "duplicate edges keep min weight, k-round horizon holds") {
    // triangle 1-2-3 with an expensive direct edge 1-3: cost(3) should
    // be 2 via 1-2-3, not 10 direct; duplicate (1,3) edges keep min
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 10L),
      (3L, 1L, 12L), (3L, 4L, 5L)).toDF("src", "dst", "w")
    val got = Graph.sssp(edges, Seq(1L).toDF("node"), maxIter = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 7L))
    // with ONE round, only direct edges are relaxed: 3 costs 10
    val one = Graph.sssp(edges, Seq(1L).toDF("node"), maxIter = 1)
      .as[(Long, Long)].collect().toMap
    assert(one(3L) === 10L && one(2L) === 1L)
  }

  test("bfsHops: hand-checked hop distances, multi-source min, and the " +
    "maxHops horizon") {
    // path 1-2-3-4-5-6-7-8 plus a shortcut 1-5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (1L, 5L)).toDF("src", "dst")
    val one = Graph.bfsHops(edges, Seq(1L).toDF("node"), maxHops = 3)
      .as[(Long, Int)].collect().toMap
    // via the shortcut: 5 is 1 hop, 6 is 2, 7 is 3; 8 beyond horizon
    assert(one === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 1,
      6L -> 2, 7L -> 3))
    // multi-source: min over seeds 1 and 8
    val multi = Graph.bfsHops(edges, Seq(1L, 8L).toDF("node"),
        maxHops = 2).as[(Long, Int)].collect().toMap
    assert(multi(7L) === 1 && multi(6L) === 2 && multi(5L) === 1)
  }

  test("delta-frontier evidence: BFS joins each node exactly once " +
    "(Σ frontier sizes = reached − sources, per-level match), sssp is " +
    "bit-identical to full-table Bellman-Ford at every horizon, and " +
    "both exit early on an empty frontier") {
    val rng = new scala.util.Random(11)
    val n = 120
    val raw = (0 until 300).map(_ =>
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong, 1L + rng.nextInt(9)))
    val wdf = raw.toDF("src", "dst", "w")
    // --- BFS: frontier sizes ARE the per-level discovery counts ---
    val fs = scala.collection.mutable.Buffer.empty[Long]
    val got = Graph.bfsHops(wdf, Seq(0L).toDF("node"), maxHops = 20,
        frontierSizes = Some(fs))
      .as[(Long, Int)].collect()
    val byHop = got.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(fs.takeWhile(_ > 0).zipWithIndex.forall { case (sz, i) =>
      byHop.getOrElse(i + 1, 0L) == sz })
    assert(fs.sum === got.length - 1) // each non-source node joined once
    // early exit: far fewer than 20 rounds actually ran (diameter of a
    // dense-ish random graph), and at most one trailing empty round
    assert(fs.size < 20 && fs.count(_ == 0L) <= 1)
    // --- SSSP: driver-side ≤k-edge-path Bellman-Ford reference ---
    def bfRef(k: Int): Map[Long, Long] = {
      val canon = raw.filter(t => t._1 != t._2)
        .groupMapReduce(t => (math.min(t._1, t._2), math.max(t._1, t._2)))(
          _._3)(math.min)
      val adj = canon.toSeq.flatMap { case ((a, b), w) =>
        Seq((a, b, w), (b, a, w)) }
      var dist = Map(0L -> 0L)
      for (_ <- 1 to k) {
        val relaxed = adj.flatMap { case (u, v, w) =>
          dist.get(u).map(d => v -> (d + w)) }
        dist = (dist.toSeq ++ relaxed).groupMapReduce(_._1)(_._2)(math.min)
      }
      dist
    }
    for (k <- Seq(1, 2, 4)) {
      val sfs = scala.collection.mutable.Buffer.empty[Long]
      val s = Graph.sssp(wdf, Seq(0L).toDF("node"), maxIter = k,
          frontierSizes = Some(sfs))
        .as[(Long, Long)].collect().toMap
      assert(s === bfRef(k), s"horizon k=$k")
      // the frontier shrinks below the reached set once costs settle
      if (k == 4) assert(sfs.last <= sfs.max)
    }
  }
}
