package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Distributed power iteration (Similarity.powerIterationTop):
  * dominant-axis recovery on a constructed corpus and exact agreement
  * with a plain-Scala replica of the pinned arithmetic. */
class PowerIterationSpec extends SparkSpec {
  import spark.implicits._

  private def run(vecs: Seq[(Long, Seq[Float])], dims: Int, iters: Int)
      : Map[Long, Double] =
    Similarity.powerIterationTop(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        dims = dims, iters = iters)
      .as[(Long, Double)].collect().toMap

  /** Plain-Scala replica: centered matvecs, per-round normalize +
    * round-9 (unordered float sums — compared at 1e-6). */
  private def ref(vecs: Seq[Seq[Float]], dims: Int, iters: Int)
      : (Array[Double], Double) = {
    val x = vecs.map(_.map(_.toDouble).toArray).toArray
    val n = x.length
    val mu = Array.tabulate(dims)(j => x.map(_(j)).sum / n)
    val c = x.map(r => Array.tabulate(dims)(j => r(j) - mu(j)))
    var v = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    var lam = 0.0
    for (_ <- 1 to iters) {
      val s = c.map(r => (0 until dims).map(j => r(j) * v(j)).sum)
      val w = Array.tabulate(dims)(j =>
        c.indices.map(i => c(i)(j) * s(i)).sum)
      lam = math.sqrt(w.map(t => t * t).sum)
      v = w.map(t => BigDecimal(t / lam)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    (v, lam / n)
  }

  test("recovers a planted dominant axis: variance concentrated on " +
    "dim 1 puts nearly all loading there, and the eigenvalue row " +
    "matches the planted variance scale") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 200L).map { i =>
      val v = Array.fill(4)(rnd.nextGaussian().toFloat * 0.05f)
      v(1) = (if (i % 2 == 0) 3.0f else -3.0f) + v(1)
      (i, v.toSeq)
    }
    val got = run(vecs, dims = 4, iters = 3)
    assert(math.abs(math.abs(got(1L)) - 1.0) < 0.01,
      s"dominant loading should be ~±1: ${got(1L)}")
    for (j <- Seq(0L, 2L, 3L))
      assert(math.abs(got(j)) < 0.1, s"off-axis loading $j: ${got(j)}")
    // planted variance ~9 on the dominant axis
    assert(got(-1L) > 7.0 && got(-1L) < 11.0, s"eig: ${got(-1L)}")
  }

  test("matches the plain-Scala replica of the pinned arithmetic on a " +
    "random corpus (1 and 3 iterations)") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat)))
    for (iters <- Seq(1, 3)) {
      val got = run(vecs, dims = 8, iters = iters)
      val (v, eig) = ref(vecs.map(_._2), dims = 8, iters = iters)
      for (j <- 0 until 8)
        assert(math.abs(got(j.toLong) - BigDecimal(v(j)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6,
          s"dim $j iters=$iters: ${got(j.toLong)} vs ${v(j)}")
      assert(math.abs(got(-1L) - eig) < 1e-4, s"eig iters=$iters")
    }
  }
}
