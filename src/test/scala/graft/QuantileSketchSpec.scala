package graft

import graft.functions.{KllSketch, KllState, QuantileSketchAgg}

/** KLL mergeable quantile sketch: exactness under capacity, worst-case
  * rank-error bounds at scale, merge-grouping invariance (the mergeable
  * guarantee), and the in-Spark typed-Aggregator path. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 128
  private val Probs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)

  /** Deterministic pseudo-shuffled stream: i*2654435761 mod 2^32 walks
    * the range in a fixed scrambled order (no RNG — replayable). */
  private def scrambled(n: Int): Seq[Double] =
    (0 until n).map(i => ((i.toLong * 2654435761L) % n + n) % n)
      .map(_.toDouble)

  private def sketchOf(xs: Seq[Double]): KllState =
    xs.foldLeft(KllSketch.empty)((s, x) => KllSketch.insert(s, x, K))

  /** Normalized rank error of estimate q against the sorted truth. */
  private def rankError(sorted: IndexedSeq[Double], p: Double,
                        q: Double): Double = {
    val rank = sorted.count(_ <= q).toDouble / sorted.size
    math.abs(rank - p)
  }

  test("exact below capacity: every quantile is the true discrete one") {
    val xs = scrambled(50) // < level-0 capacity: nothing ever compacts
    val s = sketchOf(xs)
    val sorted = xs.sorted.toIndexedSeq
    for (p <- Probs) {
      val expected = sorted(math.max(0,
        math.ceil(p * sorted.size).toInt - 1))
      assert(KllSketch.quantile(s, p) === expected, s"p=$p")
    }
    assert(s.n === 50)
  }

  test("rank error stays bounded at 100k values (k=128)") {
    val xs = scrambled(100000)
    val s = sketchOf(xs)
    val sorted = xs.sorted.toIndexedSeq
    // state actually stayed sketch-sized, not data-sized
    assert(s.levels.map(_.size).sum < 10 * K)
    for (p <- Probs) {
      val err = rankError(sorted, p, KllSketch.quantile(s, p))
      assert(err <= 0.03, s"p=$p rank error $err")
    }
  }

  test("merge-grouping invariance: linear fold and balanced-tree merges " +
    "of 16 partial sketches both respect the error bound") {
    val xs = scrambled(80000)
    val sorted = xs.sorted.toIndexedSeq
    val parts = xs.grouped(5000).map(sketchOf).toVector
    assert(parts.size === 16)
    val linear = parts.reduceLeft((a, b) => KllSketch.merge(a, b, K))
    def tree(v: Vector[KllState]): KllState =
      if (v.size == 1) v.head
      else tree(v.grouped(2).map {
        case Vector(a, b) => KllSketch.merge(a, b, K)
        case Vector(a) => a
      }.toVector)
    val balanced = tree(parts)
    assert(linear.n === 80000 && balanced.n === 80000)
    for (p <- Probs; s <- Seq(linear, balanced)) {
      val err = rankError(sorted, p, KllSketch.quantile(s, p))
      assert(err <= 0.03, s"p=$p rank error $err")
    }
  }

  test("typed Aggregator: per-group medians from one map-side pass land " +
    "within the bound of the exact per-group medians") {
    val agg = new QuantileSketchAgg(K, Seq(0.5)).toColumn
    val n = 20000
    val ds = spark.range(n)
      .map(i => (i % 4, ((i * 2654435761L) % 10000).toDouble / 10.0))
    val got = ds.groupByKey(_._1).mapValues(_._2)
      .agg(agg).collect().toMap
    val exact = ds.collect().groupBy(_._1)
      .map { case (g, rows) =>
        val s = rows.map(_._2).sorted
        g -> s(math.ceil(0.5 * s.length).toInt - 1)
      }
    for ((g, est) <- got) {
      val all = ds.filter(_._1 == g).map(_._2).collect().sorted.toIndexedSeq
      val rank = all.count(_ <= est.head).toDouble / all.size
      assert(math.abs(rank - 0.5) <= 0.04,
        s"group $g median ${est.head} vs exact ${exact(g)} rank $rank")
    }
  }
}
