package graft

import org.apache.spark.sql.functions._

import graft.ops.Selection

/** [[graft.ops.Selection.kthValue]] — exact order statistics by
  * bracketed selection, the no-global-sort replacement for
  * `row_number().over(Window.orderBy(v))` medians (q211 Theil–Sen,
  * q226 Hodges–Lehmann). Properties checked against the trivially
  * correct sorted-array oracle, on both sides of the bracket-activation
  * threshold and under heavy ties (the band collapses to distinct
  * values — tie mass must cost nothing AND stay correct). */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def lowerMedianK(n: Long): Long = (n + 1) / 2

  test("medianValue equals the sorted-array lower median on random " +
    "long frames with ties (below the bracket threshold; seeded sweep " +
    "of 30 odd/even/tie-heavy cases)") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 30) {
      val n = 1 + rnd.nextInt(400)
      val xs = List.fill(n)(rnd.nextLong(101) - 50)
      val got = Selection.medianValue(xs.toDF("v"), col("v"))
        .as[(Long, Long)].head()
      val sorted = xs.sorted
      assert(got._1 === n.toLong, s"trial $trial")
      assert(got._2 === sorted((lowerMedianK(n.toLong) - 1).toInt),
        s"trial $trial: n=$n")
    }
  }

  test("kthValue is exact for every k of a small frame (full rank sweep)") {
    val xs = Seq(5L, 1L, 3L, 3L, 9L, 7L, 3L, 1L, 8L, 2L)
    val sorted = xs.sorted
    for (k <- 1 to xs.size) {
      val got = Selection.kthValue(xs.toDF("v"), col("v"),
        _ => lit(k.toLong), q = k.toDouble / xs.size)
        .as[(Long, Long)].head()
      assert(got === ((xs.size.toLong, sorted(k - 1))),
        s"k=$k: got $got, want ${sorted(k - 1)}")
    }
  }

  test("medianValue crosses the bracket-activation threshold correctly: " +
    "a frame larger than bracketMinRows with a skewed, tie-heavy value " +
    "distribution matches the closed-form median") {
    // 150k rows of floor(sqrt(i)): tie-heavy (value v repeats ~2v+1
    // times), skewed, and deterministic — the exact median is
    // floor(sqrt(k-1)) of the ASCENDING sequence since the generator
    // is monotone in i
    val n = 150000L
    assert(n > Selection.bracketMinRows)
    val df = spark.range(n)
      .select(floor(sqrt(col("id").cast("double"))).cast("long").as("v"))
    val got = Selection.medianValue(df, col("v")).as[(Long, Long)].head()
    val k = lowerMedianK(n)
    assert(got === ((n, math.floor(math.sqrt((k - 1).toDouble)).toLong)))
  }

  test("medianValue on doubles (the q211 slope type) matches the " +
    "sorted oracle, including negative and duplicated values") {
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 30) {
      val n = 1 + rnd.nextInt(300)
      val xs = List.fill(n)((rnd.nextInt(41) - 20) / 4.0)
      val got = Selection.medianValue(xs.toDF("v"), col("v"))
        .as[(Long, Double)].head()
      val sorted = xs.sorted
      assert(got._1 === n.toLong, s"trial $trial")
      assert(got._2 === sorted((lowerMedianK(n.toLong) - 1).toInt),
        s"trial $trial: n=$n")
    }
  }

  test("empty input yields (n=0, kth=null), not an error") {
    val got = Selection.medianValue(
      Seq.empty[Long].toDF("v"), col("v"))
      .select(col("n"), col("kth").isNull.as("isnull"))
      .as[(Long, Boolean)].head()
    assert(got === ((0L, true)))
  }

  test("single row and all-equal frames: kth is the value itself") {
    assert(Selection.medianValue(Seq(42L).toDF("v"), col("v"))
      .as[(Long, Long)].head() === ((1L, 42L)))
    val eq = Seq.fill(5000)(7L).toDF("v")
    assert(Selection.medianValue(eq, col("v"))
      .as[(Long, Long)].head() === ((5000L, 7L)))
  }

  test("exactQuantilesCont equals the built-in exact percentile " +
    "BIT-FOR-BIT on random frames — below the bracket threshold") {
    val rnd = new scala.util.Random(99L)
    val probs = Seq(0.01, 0.05, 0.25, 0.5, 0.75, 0.9, 0.99)
    for (trial <- 1 to 5) {
      val n = 1 + rnd.nextInt(2000)
      // duplicated + negative values; round to force tie mass
      val xs = List.fill(n)(math.floor(rnd.nextDouble() * 200 - 100) / 2.0)
      val df = xs.toDF("v")
      val want = df.agg(expr(
        s"percentile(v, array(${probs.mkString(",")}))").as("e"))
        .as[Seq[Double]].head()
      val got = Selection.exactQuantilesCont(df, col("v"), probs)
        .orderBy("pos").select("exact").as[Double].collect().toSeq
      assert(got === want, s"trial $trial n=$n")
    }
  }

  test("exactQuantilesCont equals the built-in exact percentile " +
    "BIT-FOR-BIT above the bracket threshold (GK brackets active), " +
    "with nulls ignored like the built-in") {
    val n = 150000
    assert(n > Selection.bracketMinRows)
    val probs = Seq(0.01, 0.5, 0.999)
    val df = spark.range(n.toLong).select(
      when(col("id") % 97 === 0, lit(null).cast("double"))
        .otherwise(pow(sin(col("id").cast("double")), 2) * 1000)
        .as("v"))
    val want = df.agg(expr(
      s"percentile(v, array(${probs.mkString(",")}))").as("e"))
      .as[Seq[Double]].head()
    val got = Selection.exactQuantilesCont(df, col("v"), probs)
      .orderBy("pos").select("exact").as[Double].collect().toSeq
    assert(got === want)
  }

  test("medianValue is partition-LAYOUT invariant above the bracket " +
    "threshold: the GK bracket endpoints may shift with partial-merge " +
    "order, but the selected exact value must not (the bracket only " +
    "needs to CONTAIN k — correctness never rides sketch determinism)") {
    val n = 150000L
    assert(n > Selection.bracketMinRows)
    val df = spark.range(n).select((col("id") % 7919).as("v"))
    val got = Seq(1, 4, 32).map { p =>
      Selection.medianValue(df.repartition(p), col("v"))
        .as[(Long, Long)].head()
    }
    assert(got.distinct.size === 1,
      s"median changed with partition layout: $got")
    val sorted = df.as[Long].collect().sorted
    assert(got.head === ((n, sorted(((n + 1) / 2 - 1).toInt))))
  }

  test("exactQuantilesContGrouped equals the built-in grouped exact " +
    "percentile BIT-FOR-BIT on random frames, below and above the " +
    "bracket threshold, with nulls ignored and empty groups absent") {
    val probs = Seq(0.1, 0.25, 0.5, 0.9)
    val rnd = new scala.util.Random(7L)
    // below-threshold: 4 groups of uneven sizes, ties, negatives, nulls
    val xs = (1 to 3000).map { i =>
      val g = s"g${i % 4}"
      val v: java.lang.Double =
        if (i % 53 == 0) null
        else math.floor(rnd.nextDouble() * 100 - 50) / 4.0
      (g, v)
    }
    val small = xs.toDF("k", "v")
    // above-threshold: 2 groups, one past bracketMinRows
    val big = spark.range(260000).select(
      when(col("id") % 2 === 0, lit("a")).otherwise(lit("b")).as("k"),
      when(col("id") % 101 === 0, lit(null).cast("double"))
        .otherwise(pow(sin(col("id").cast("double")), 2) * 1000).as("v"))
    for ((df, tag) <- Seq((small, "small"), (big, "big"))) {
      val want = df.groupBy("k").agg(expr(
          s"percentile(v, array(${probs.mkString(",")}))").as("e"))
        .select(col("k"), posexplode(col("e")))
        .select(col("k"), col("pos"), col("col").as("exact"))
        .orderBy("k", "pos")
        .as[(String, Int, Double)].collect().toSeq
      val got = Selection.exactQuantilesContGrouped(df, Seq("k"),
          col("v"), probs)
        .select(col("k"), col("pos"), col("exact"))
        .orderBy("k", "pos")
        .as[(String, Int, Double)].collect().toSeq
      assert(got.size === want.size, tag)
      got.zip(want).foreach { case ((gk, gp, gv), (wk, wp, wv)) =>
        assert(gk === wk && gp === wp, tag)
        assert(java.lang.Double.doubleToLongBits(gv) ===
          java.lang.Double.doubleToLongBits(wv), s"$tag $gk pos=$gp")
      }
    }
    // a group whose values are ALL null yields no output row, matching
    // a percentile of null that callers left-join around
    val withNullGroup = (Seq(("z", null: java.lang.Double)) ++
      Seq(("y", java.lang.Double.valueOf(1.0)))).toDF("k", "v")
    val keys = Selection.exactQuantilesContGrouped(withNullGroup,
      Seq("k"), col("v"), Seq(0.5)).select("k").as[String].collect()
    assert(keys.toSeq === Seq("y"))
  }

  test("plan shape: no Window operator and no shuffle of the input " +
    "frame — the only exchanges serve the two model-sized aggregates") {
    val df = spark.range(200000).select((col("id") % 997).as("v"))
    val plan = Selection.medianValue(df, col("v"))
      .queryExecution.executedPlan
    assert(graft.plans.PlanGuard.globalWindows(plan).isEmpty,
      "selection must not fall back to a global window")
    val s = plan.toString
    assert(!s.contains("CartesianProduct"))
  }
}
