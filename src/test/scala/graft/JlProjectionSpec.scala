package graft

import org.apache.spark.sql.functions._

import graft.engine.TextFunctions
import graft.ops.Similarity

/** Johnson–Lindenstrauss projection + distortion audit
  * (Similarity.jlDistortionAudit): exact agreement with a plain-Scala
  * replica of the md5-sign matrix arithmetic, and the JL
  * concentration-around-1 shape on a random corpus. */
class JlProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def md5Sign(seedIdx: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"1:$seedIdx".getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    1.0 - 2.0 * (java.lang.Long.parseLong(hex, 16) % 2)
  }

  test("the audit matches a plain-Scala replica bin-for-bin (dims 8, " +
    "k 4)") {
    val rnd = new scala.util.Random(3)
    val n = 40
    val vecs = (0L until n.toLong).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat)))
    val got = Similarity.jlDistortionAudit(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        dims = 8, k = 4)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    // replica
    val x = vecs.map(_._2.map(_.toDouble).toArray)
    val r = Array.tabulate(4, 8)((t, j) => md5Sign(t * 8L + j))
    def proj(v: Array[Double]): Array[Double] =
      Array.tabulate(4)(t =>
        (0 until 8).map(j => r(t)(j) * v(j)).sum / math.sqrt(4.0))
    val h = n / 2
    val ratios = (0 until h).flatMap { a =>
      val d2o = (0 until 8).map(j =>
        math.pow(x(a)(j) - x(a + h)(j), 2)).sum
      if (d2o <= 0) None else {
        val (ya, yb) = (proj(x(a)), proj(x(a + h)))
        val d2p = (0 until 4).map(t => math.pow(ya(t) - yb(t), 2)).sum
        Some(d2p / d2o)
      }
    }
    val want = ratios.groupBy(rr => math.floor(rr / 0.25).toLong)
      .map { case (b, rs) => b -> (rs.size.toLong, rs.sum / rs.size) }
    assert(got.keySet === want.keySet)
    for ((b, (np, mr)) <- got) {
      assert(np === want(b)._1, s"bin $b count")
      assert(math.abs(mr - want(b)._2) < 1e-3, s"bin $b mean")
    }
  }

  test("JL concentration: on a 64->16 projection of a random corpus, " +
    "the pair-weighted mean ratio sits near 1 and most mass lands " +
    "within [0.5, 1.75)") {
    val rnd = new scala.util.Random(9)
    val vecs = (0L until 300L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian().toFloat)))
    val rows = Similarity.jlDistortionAudit(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        dims = 64, k = 16)
      .as[(Long, Long, Double)].collect()
    val total = rows.map(_._2).sum
    val weighted = rows.map(r => r._2 * r._3).sum / total
    assert(math.abs(weighted - 1.0) < 0.15, s"mean ratio $weighted")
    val central = rows.filter(r => r._1 >= 2 && r._1 <= 6).map(_._2).sum
    assert(central.toDouble / total > 0.8,
      s"mass in [0.5, 1.75): $central/$total")
  }

  test("the plain-Scala md5 sign replica matches the engine's " +
    "md5Hash48(seed=1) parity — the replica tests above test the " +
    "real matrix") {
    val got = spark.range(0, 64)
      .select(col("id"),
        (lit(1.0d) - lit(2.0d) * pmod(TextFunctions.md5Hash48(
          col("id").cast("string"), seed = 1), lit(2L)).cast("double"))
          .as("s"))
      .as[(Long, Double)].collect().toMap
    for (i <- 0L until 64L)
      assert(got(i) === md5Sign(i), s"i=$i")
  }
}
