package graft

import org.apache.spark.sql.functions._

import graft.ops.{AsOf, TextAnalysis}

/** Direction/tolerance variants of the composed as-of join, checked
  * against a driver-side brute force, plus the Gopher quality filter. */
class AsOfVariantsSpec extends SparkSpec {
  import spark.implicits._

  // randomized corpus shared by the brute-force equivalence tests;
  // unique (k, rt) on the right (the operator's value-determinism
  // contract) via distinctBy
  private val rng = new scala.util.Random(41)
  private lazy val leftRows = (1 to 250).map { i =>
    (rng.nextInt(12).toLong, rng.nextInt(500).toLong, s"L$i")
  }
  private lazy val rightRows = (1 to 180).map { i =>
    (rng.nextInt(14).toLong, rng.nextInt(500).toLong, s"R$i")
  }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq

  private def brute(direction: String, tol: Option[Long]) =
    leftRows.map { case (k, t, lv) =>
      val cands = rightRows.filter(_._1 == k)
      val back = cands.filter(_._2 <= t)
        .filter(r => tol.forall(x => t - r._2 <= x))
        .sortBy(_._2).lastOption
      val fwd = cands.filter(_._2 >= t)
        .filter(r => tol.forall(x => r._2 - t <= x))
        .sortBy(_._2).headOption
      val pick = direction match {
        case "backward" => back
        case "forward"  => fwd
        case "nearest"  => (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (t - b._2 <= f._2 - t) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
      }
      (k, t, lv) -> pick.map(_._3)
    }.toMap

  private def run(direction: String, tol: Option[Long]) =
    AsOf.join(leftRows.toDF("k", "t", "lv"),
        rightRows.toDF("k", "rt", "rv"), "k", "t", "rt", Seq("rv"),
        direction = direction, tolerance = tol.map(lit(_)))
      .select($"k", $"t", $"lv", $"asof_rv")
      .as[(Long, Long, String, Option[String])].collect()
      .map { case (k, t, lv, rv) => (k, t, lv) -> rv }.toMap

  for (dir <- Seq("backward", "forward", "nearest");
       tol <- Seq(None, Some(40L)))
    test(s"as-of $dir tolerance=$tol matches brute force") {
      assert(run(dir, tol) === brute(dir, tol))
    }

  test("forward tie: a right row at exactly leftTime matches; nearest " +
    "prefers backward on equidistant candidates") {
    val left = Seq((1L, 10L, "l1"), (2L, 10L, "l2")).toDF("k", "t", "lv")
    val right = Seq((1L, 10L, "exact"), (2L, 5L, "b"), (2L, 15L, "f"))
      .toDF("k", "rt", "rv")
    val fwd = AsOf.join(left, right, "k", "t", "rt", Seq("rv"),
        direction = "forward")
      .select($"lv", $"asof_rv").as[(String, String)].collect().toMap
    assert(fwd("l1") === "exact")
    val near = AsOf.join(left, right, "k", "t", "rt", Seq("rv"),
        direction = "nearest")
      .select($"lv", $"asof_rv").as[(String, String)].collect().toMap
    assert(near("l2") === "b") // 5 behind vs 5 ahead → backward wins
  }

  test("gopherQuality: rules fire on the right documents and keep is " +
    "their conjunction") {
    val docs = Seq(
      (1L, ("the a " + Seq.fill(60)("word").mkString(" "))), // passes all
      (2L, "the a short doc"),                               // too few words
      (3L, Seq.fill(60)("word").mkString(" "))               // no stopwords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherQuality(docs, "doc_id", "text",
        minWords = 50, maxWords = 90)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._5)) === Seq((1L, 1L), (2L, 0L), (3L, 0L)))
    val d1 = got.head
    assert(d1._2 === 62L && d1._4 === 2L) // n_words, stop_count
  }
}
