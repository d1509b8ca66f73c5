package graft

import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, TextAnalysis}

/** Prefix-doubling suffix-rank dedup (DedupOps.prefixDoublingDupStarts)
  * vs a brute-force L-gram reference, across power-of-two and general L
  * (the overlap-pair path), plus DSIR log-weight invariants. */
class SuffixDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: duplicated length-L run starts by direct gram count. */
  private def bruteStarts(docs: Seq[(Long, Seq[String])], L: Int,
                          minCount: Int = 2): Set[(Long, Int)] = {
    val grams = for {
      (id, ws) <- docs
      p <- 0 to ws.length - L
    } yield ((id, p), ws.slice(p, p + L).mkString(" "))
    val counts = grams.groupBy(_._2).view.mapValues(_.size).toMap
    grams.collect { case ((id, p), g) if counts(g) >= minCount => (id, p) }
      .toSet
  }

  private def corpus(seed: Int, nDocs: Int, len: Int, vocab: Int) = {
    val rnd = new scala.util.Random(seed)
    (0L until nDocs).map(id =>
      (id, Seq.fill(len + rnd.nextInt(len))("w" + rnd.nextInt(vocab))))
  }

  private def run(docs: Seq[(Long, Seq[String])], L: Int): Set[(Long, Int)] = {
    val toks = docs.toDF("doc_id", "ws")
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("p", "w")))
    DedupOps.prefixDoublingDupStarts(toks, "doc_id", "p", "w", L)
      .as[(Long, Int)].collect().toSet
  }

  test("prefix doubling matches the brute-force gram reference at " +
    "power-of-two L (2, 8) on a high-collision random corpus") {
    for (l <- Seq(2, 8); seed <- Seq(1, 2)) {
      val docs = corpus(seed, nDocs = 12, len = 30, vocab = 4)
      assert(run(docs, l) === bruteStarts(docs, l), s"L=$l seed=$seed")
    }
  }

  test("general L (3, 12): the overlap-pair key — (rank_m(p), " +
    "rank_m(p+L-m)), m = 2^floor(log2 L) — is exact, not just the " +
    "power-of-two path") {
    for (l <- Seq(3, 12); seed <- Seq(3, 4)) {
      val docs = corpus(seed, nDocs = 10, len = 40, vocab = 3)
      assert(run(docs, l) === bruteStarts(docs, l), s"L=$l seed=$seed")
    }
  }

  test("runs never cross document boundaries, and a doc shorter than L " +
    "contributes nothing") {
    val docs = Seq(
      (0L, Seq("a", "b", "c", "d")), // suffix 'c d' + next doc's prefix
      (1L, Seq("c", "d", "a", "b")), // would fake an L=4 dup if crossed
      (2L, Seq("a", "b")))           // shorter than L
    assert(run(docs, 4) === bruteStarts(docs, 4))
    assert(run(docs, 4) === Set.empty)
    // the L=2 dups it DOES have are found
    assert(run(docs, 2) === bruteStarts(docs, 2))
    assert(run(docs, 2).nonEmpty)
  }

  test("identical 8-token prefixes in different docs are one dup pair: " +
    "rank equality is exactly gram equality") {
    val shared = Seq("x1", "x2", "x3", "x4", "x5", "x6", "x7", "x8")
    val docs = Seq(
      (0L, shared ++ Seq("tail0")),
      (1L, Seq("head1") ++ shared),
      (2L, Seq("u1", "u2", "u3", "u4", "u5", "u6", "u7", "u8")))
    assert(run(docs, 8) === Set((0L, 0), (1L, 1)))
  }

  test("suffixRanks is the dense 1..K LEXICOGRAPHIC rank of the " +
    "depth-run — order-consistent, not just equality classes " +
    "(depth 8 exercises the radix-4 merged round)") {
    for (seed <- Seq(7, 8); depth <- Seq(2, 4, 8)) {
      val docs = corpus(seed, nDocs = 8, len = 20, vocab = 3)
      val toks = docs.toDF("doc_id", "ws")
        .select(col("doc_id"), posexplode(col("ws")).as(Seq("p", "w")))
      val got = DedupOps.suffixRanks(toks, "doc_id", "p", "w", depth)
        .as[(Long, Int, Long)].collect()
      val runs = (for {
        (id, ws) <- docs; p <- 0 to ws.length - depth
      } yield ((id, p), ws.slice(p, p + depth).mkString(" "))).toMap
      val lexRank = runs.values.toSeq.distinct.sorted.zipWithIndex
        .map { case (g, i) => g -> (i + 1L) }.toMap
      assert(got.length === runs.size, s"seed=$seed depth=$depth")
      for ((id, p, r) <- got)
        assert(r === lexRank(runs((id, p))),
          s"seed=$seed depth=$depth pos=($id,$p)")
    }
  }

  test("suffixLcpPairs on a hand-computed corpus: adjacency in suffix " +
    "order and exact lcp per adjacent pair") {
    val docs = Seq((0L, Seq("a", "b", "c", "d", "e")),
                   (1L, Seq("a", "b", "c", "x", "y")))
    val toks = docs.toDF("doc_id", "ws")
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("p", "w")))
    val got = DedupOps.suffixLcpPairs(toks, "doc_id", "p", "w", depth = 4)
      .as[(Long, Long, Int, Long, Int, Long)].collect().sortBy(_._1)
    // suffix order of the depth-4 runs: [a b c d](0,0), [a b c x](1,0),
    // [b c d e](0,1), [b c x y](1,1) → lcps 3, 0, 2
    assert(got.toSeq === Seq(
      (1L, 0L, 0, 1L, 0, 3L),
      (2L, 1L, 0, 0L, 1, 0L),
      (3L, 0L, 1, 1L, 1, 2L)))
  }

  test("suffixLcpPairs matches a brute-force sorted-suffix reference " +
    "(depth 4 and 8) on high-collision random corpora, including " +
    "full-depth ties (lcp = depth)") {
    for (depth <- Seq(4, 8); seed <- Seq(5, 6)) {
      val docs = corpus(seed, nDocs = 10, len = 25, vocab = 3)
      val toks = docs.toDF("doc_id", "ws")
        .select(col("doc_id"), posexplode(col("ws")).as(Seq("p", "w")))
      val got = DedupOps.suffixLcpPairs(toks, "doc_id", "p", "w", depth)
        .as[(Long, Long, Int, Long, Int, Long)].collect().sortBy(_._1)
      // brute force: sort all depth-runs (tokens carry no sub-0x20
      // chars, so the joined-string sort IS the tokenwise sort),
      // pair neighbors, count common leading tokens
      val runs = (for {
        (id, ws) <- docs; p <- 0 to ws.length - depth
      } yield (id, p, ws.slice(p, p + depth)))
        .sortBy { case (id, p, run) => (run.mkString(" "), id, p) }
      val want = runs.zip(runs.tail).zipWithIndex.map {
        case (((idL, pL, rL), (idR, pR, rR)), i) =>
          val lcp = rL.zip(rR).takeWhile { case (a, b) => a == b }.length
          (i + 1L, idL, pL, idR, pR, lcp.toLong)
      }
      assert(got.toSeq === want, s"depth=$depth seed=$seed")
      assert(want.exists(_._6 == depth.toLong),
        s"fixture should contain a full-depth tie (depth=$depth seed=$seed)")
    }
  }

  test("a token carrying a sub-0x20 control character fails the " +
    "suffixRanks contract gate loudly (tokenwise order would diverge " +
    "from the space-joined gram sort) — not as an opaque mismatch") {
    val docs = Seq((0L, Seq("aa", "aa\u0001x", "bb")),
                   (1L, Seq("aa", "cc", "bb")))
    val toks = docs.toDF("doc_id", "ws")
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("p", "w")))
    val e = intercept[IllegalArgumentException] {
      DedupOps.suffixRanks(toks, "doc_id", "p", "w", depth = 2).collect()
    }
    assert(e.getMessage.contains("control character"))
    // a clean corpus of the same shape passes
    val clean = Seq((0L, Seq("aa", "ax", "bb")), (1L, Seq("aa", "cc", "bb")))
      .toDF("doc_id", "ws")
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("p", "w")))
    assert(DedupOps.suffixRanks(clean, "doc_id", "p", "w", depth = 2)
      .count() === 4L)
  }

  test("DSIR log-weights: target-looking docs score above pool-looking " +
    "docs, and every doc gets exactly one row") {
    val target = (0L until 20L).map(i =>
      (i, "alpha beta gamma delta alpha beta", true))
    val raw = (20L until 40L).map(i =>
      (i, "omega psi chi phi omega psi", false))
    val mixedRaw = Seq((40L, "alpha beta gamma omega", false))
    val df = (target ++ raw ++ mixedRaw).toDF("doc_id", "text", "tgt")
    val got = TextAnalysis.dsirLogWeights(df, "doc_id", "text",
        isTarget = col("tgt"), buckets = 64)
      .as[(Long, Boolean, Long, Double)].collect()
    assert(got.length === 41)
    val byId = got.map(r => r._1 -> r._4).toMap
    // pure-target vocabulary scores strictly above pure-pool vocabulary
    assert(byId(0L) > byId(20L))
    // the half-target raw doc lands strictly between the two poles
    assert(byId(40L) > byId(20L) && byId(40L) < byId(0L))
    // token counts ride along
    assert(got.find(_._1 == 40L).get._3 === 4L)
  }
}
