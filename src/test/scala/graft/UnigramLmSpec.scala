package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Unigram-LM tokenizer training (TextAnalysis.unigramLmTrain):
  * hand-computed single-iteration EM numbers on a 3-token corpus, a
  * plain-Scala soft-EM reference across 2 iterations, and the
  * cohesive-bigram sanity direction. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Plain-Scala reference: soft EM over 1-2 char piece lattices,
    * words truncated at `maxLen`, probs rounded 9 dp per round. */
  private def refEm(wordFreq: Map[String, Long], iters: Int,
                    maxLen: Int): Map[String, (Double, Double)] = {
    val words = wordFreq.toSeq
      .map { case (w, f) => (w.take(maxLen), f) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def pieces(w: String): Seq[String] =
      (1 to w.length).map(i => w.substring(i - 1, i)) ++
        (2 to w.length).map(i => w.substring(i - 2, i))
    val c0 = words.toSeq.flatMap { case (w, f) => pieces(w).map(_ -> f) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum.toDouble).toMap
    var p = c0.view.mapValues(c => round9(c / c0.values.sum)).toMap
    var cOut: Map[String, Double] = Map.empty
    for (_ <- 1 to iters) {
      val contrib =
        scala.collection.mutable.Map.empty[String, List[Double]]
      for ((w, f) <- words) {
        val n = w.length
        val a = new Array[Double](n + 1); a(0) = 1.0
        for (i <- 1 to n)
          a(i) = a(i - 1) * p(w.substring(i - 1, i)) +
            (if (i >= 2) a(i - 2) * p(w.substring(i - 2, i)) else 0.0)
        val b = new Array[Double](n + 1); b(n) = 1.0
        for (i <- n - 1 to 0 by -1)
          b(i) = p(w.substring(i, i + 1)) * b(i + 1) +
            (if (i + 2 <= n) p(w.substring(i, i + 2)) * b(i + 2) else 0.0)
        val z = a(n)
        val per = scala.collection.mutable.Map.empty[String, List[Double]]
        for (i <- 1 to n) {
          val pc = w.substring(i - 1, i)
          per(pc) = (a(i - 1) * p(pc) * b(i) / z) :: per.getOrElse(pc, Nil)
        }
        for (i <- 1 until n) {
          val pc = w.substring(i - 1, i + 1)
          per(pc) =
            (a(i - 1) * p(pc) * b(i + 1) / z) :: per.getOrElse(pc, Nil)
        }
        for ((pc, gs) <- per)
          contrib(pc) = (f.toDouble * gs.sorted.sum) ::
            contrib.getOrElse(pc, Nil)
      }
      cOut = contrib.toMap.map { case (pc, l) => pc -> l.sorted.sum }
      val t = cOut.values.toSeq.sorted.sum
      p = cOut.map { case (pc, c) => pc -> round9(c / t) }
    }
    cOut.map { case (pc, c) => pc -> (c, p(pc)) }
  }

  private def run(texts: Seq[String], iters: Int, maxLen: Int)
      : Map[String, (Long, Double, Double)] =
    TextAnalysis.unigramLmTrain(texts.toDF("text"), "text",
        iters = iters, maxWordLen = maxLen)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("hand-computed EM on {ab x2, b x1}: init p = (2/7, 3/7, 2/7); " +
    "one round gives counts (0.6, 1.6, 1.4) and probs " +
    "(1/6, 4/9, 7/18)") {
    // word 'ab': alpha = [1, 2/7, 20/49], Z = 20/49;
    // gamma(a@1) = gamma(b@2) = 0.3, gamma(ab) = 0.7; word 'b': 1.0
    val got = run(Seq("ab ab b"), iters = 1, maxLen = 8)
    assert(got.keySet === Set("a", "b", "ab"))
    assert(math.abs(got("a")._2 - 0.6) < 1e-6)
    assert(math.abs(got("b")._2 - 1.6) < 1e-6)
    assert(math.abs(got("ab")._2 - 1.4) < 1e-6)
    assert(math.abs(got("a")._3 - 1.0 / 6) < 1e-6)
    assert(math.abs(got("b")._3 - 4.0 / 9) < 1e-6)
    assert(math.abs(got("ab")._3 - 7.0 / 18) < 1e-6)
    assert(got("ab")._1 === 2L)
  }

  test("matches the plain-Scala soft-EM reference over 2 iterations, " +
    "including word truncation at maxWordLen") {
    val texts = Seq("alpha beta beta gamma gamma gamma verylongword",
      "alpha alpha delta verylongword beta", "ab ba ab gamma")
    val wordFreq = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, l) => w -> l.size.toLong }
    for ((iters, maxLen) <- Seq((1, 8), (2, 8), (2, 4))) {
      val want = refEm(wordFreq, iters, maxLen)
      val got = run(texts, iters, maxLen)
      assert(got.keySet === want.keySet, s"iters=$iters maxLen=$maxLen")
      for ((pc, (_, em, pr)) <- got) {
        assert(math.abs(em - want(pc)._1) < 1e-6,
          s"count($pc) iters=$iters maxLen=$maxLen")
        assert(math.abs(pr - want(pc)._2) < 1e-7,
          s"prob($pc) iters=$iters maxLen=$maxLen")
      }
    }
  }

  test("EM moves mass onto a cohesive bigram: p(ab) after a round " +
    "exceeds its raw-count share") {
    val got = run(Seq("ab ab ab ab cd"), iters = 2, maxLen = 8)
    // raw-count share of 'ab' = 4 / (4+4+4 + 1+1+1) = 4/15
    assert(got("ab")._3 > 4.0 / 15)
  }

  test("Heaps'-law gram fit, exact poles: an all-unique-gram corpus " +
    "fits beta = 1 with vocab@100x = 100x the gram mass; a " +
    "fully-duplicated corpus fits beta = 0 with a flat projection") {
    import graft.ops.{TextAnalysis => TAx}
    // 20 docs x 10 tokens, every token globally unique -> every gram
    // unique -> V(T) = T at every decile
    val uniq = (0L until 20L).map(i =>
      (i, (0 until 10).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val f1 = TAx.heapsLawGramFit(uniq, "doc_id", "text", L = 8)
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(f1("beta")._1 === 1.0)
    assert(f1("log_k")._1 === 0.0)
    val t10 = f1("decile_10")._2
    assert(f1("vocab_at_100x")._1 === 100.0 * t10)
    // identical docs -> the decile vocabulary is CONSTANT -> beta = 0
    // and the projection equals that constant
    val dup = (0L until 20L).map(i =>
      (i, (0 until 10).map(j => s"same$j").mkString(" ")))
      .toDF("doc_id", "text")
    val f2 = TAx.heapsLawGramFit(dup, "doc_id", "text", L = 8)
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(f2("beta")._1 === 0.0)
    assert(f2("decile_10")._1 === 3.0) // 10-token doc has 3 grams
    assert(f2("vocab_at_100x")._1 === 3.0)
  }

  test("Heaps'-law gram fit, SKEWED doc ids (advisor r12): ids far " +
    "from 0 leave early deciles empty — those deciles are dropped " +
    "from the report and the fit, never folded in as ln(0) = -inf " +
    "(which would make beta/vocab_at_100x silently NaN)") {
    import graft.ops.{TextAnalysis => TAx}
    // ids 1000..1019: cuts k=1..9 of max+1=1020 are 102..918, all
    // BELOW every doc id, so deciles 1-9 are empty; only decile 10
    // (cut 1020) sees the corpus
    val skewed = (0L until 20L).map(i =>
      (1000L + i, (0 until 10).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = TAx.heapsLawGramFit(skewed, "doc_id", "text", L = 8)
      .as[(String, Double, Long)].collect()
    val byStat = rows.map(r => r._1 -> (r._2, r._3)).toMap
    // empty deciles are absent, populated ones present
    assert(!byStat.contains("decile_01"))
    assert(byStat.contains("decile_10"))
    // every emitted value is finite — no NaN/-inf leaked into the fit
    for ((stat, (v, _)) <- byStat)
      assert(!v.isNaN && !v.isInfinity, s"$stat = $v")
    // a one-point fit has zero x-variance: beta is NaN-free only
    // because the guard dropped the ln(0) points; with a single point
    // the OLS slope is 0/0 -> the operator must still not emit NaN
    // (sum over empty centered products = 0.0/0.0): accept either a
    // finite beta or the row being absent, but NEVER NaN
    assert(byStat.get("beta").forall(b => !b._1.isNaN))
  }

  private def runEncode(texts: Seq[String], iters: Int, maxLen: Int)
      : Map[String, (Long, Long, String)] =
    TextAnalysis.unigramLmEncode(texts.toDF("text"), "text",
        iters = iters, maxWordLen = maxLen)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("Viterbi encode, hand case: after one EM round on {ab x2, b}, " +
    "'ab' segments as the single piece (ln(7/18) beats " +
    "ln(1/6)+ln(4/9))") {
    val got = runEncode(Seq("ab ab b"), iters = 1, maxLen = 8)
    assert(got("ab") === ((2L, 1L, "ab")))
    assert(got("b") === ((1L, 1L, "b")))
  }

  test("Viterbi encode matches a plain-Scala reference (published " +
    "7-dp probs, >= tie toward the longer piece) and every " +
    "segmentation reconstructs its word") {
    val texts = Seq("alpha beta beta gamma gamma gamma verylongword",
      "alpha alpha delta verylongword beta", "ab ba ab gamma")
    val wordFreq = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, l) => w -> l.size.toLong }
    for ((iters, maxLen) <- Seq((1, 8), (2, 8), (2, 4))) {
      val pub = refEm(wordFreq, iters, maxLen)
        .map { case (pc, (_, p)) =>
          pc -> BigDecimal(p).setScale(7,
            BigDecimal.RoundingMode.HALF_UP).toDouble }
      def lp(pc: String): Double = {
        val v = pub.getOrElse(pc, 0.0)
        if (v > 0) math.log(v) else Double.NegativeInfinity
      }
      def viterbi(w0: String): Seq[String] = {
        val w = w0.take(maxLen); val n = w.length
        val vb = new Array[Double](n + 1)
        for (i <- 1 to n) {
          val one = vb(i - 1) + lp(w.substring(i - 1, i))
          val two = if (i >= 2) vb(i - 2) + lp(w.substring(i - 2, i))
                    else Double.NegativeInfinity
          vb(i) = math.max(one, two)
        }
        var i = n; var parts = List.empty[String]
        while (i > 0) {
          val one = vb(i - 1) + lp(w.substring(i - 1, i))
          val two = if (i >= 2) vb(i - 2) + lp(w.substring(i - 2, i))
                    else Double.NegativeInfinity
          if (two >= one) { parts = w.substring(i - 2, i) :: parts; i -= 2 }
          else { parts = w.substring(i - 1, i) :: parts; i -= 1 }
        }
        parts
      }
      val got = runEncode(texts, iters, maxLen)
      val wantWords = wordFreq.keySet.map(_.take(maxLen))
      assert(got.keySet === wantWords, s"iters=$iters maxLen=$maxLen")
      for ((w, (_, np, seg)) <- got) {
        assert(seg.replace("|", "") === w,
          s"segmentation must reconstruct '$w' (got '$seg')")
        val want = viterbi(w)
        assert(seg === want.mkString("|") && np === want.length.toLong,
          s"word $w iters=$iters maxLen=$maxLen")
      }
    }
  }
}
