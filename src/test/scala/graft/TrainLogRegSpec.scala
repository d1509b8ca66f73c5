package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** In-engine hashed logistic-regression training
  * (TextAnalysis.trainHashedLogReg): sign/separation invariants on a
  * constructed corpus and the output-shape contract. */
class TrainLogRegSpec extends SparkSpec {
  import spark.implicits._

  test("tokens exclusive to the positive class get positive weight, " +
    "exclusive-negative tokens negative weight, and the magnitudes " +
    "grow with more iterations") {
    val pos = (0L until 30L).map(i => (i, "goodword fineword", true))
    val neg = (30L until 60L).map(i => (i, "badword worseword", false))
    val df = (pos ++ neg).toDF("doc_id", "text", "y")
    def weights(iters: Int): Map[Long, Double] =
      TextAnalysis.trainHashedLogReg(df, "doc_id", "text",
          labelPos = col("y"), buckets = 1024, iters = iters)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> r._4).toMap
    val w2 = weights(2)
    // with 1024 buckets the four tokens land in distinct buckets whp;
    // identify them via the census columns instead of re-hashing
    val census = TextAnalysis.trainHashedLogReg(df, "doc_id", "text",
        labelPos = col("y"), buckets = 1024, iters = 1)
      .filter(col("bucket") >= 0)
      .as[(Long, Long, Long, Double)].collect()
    assert(census.length === 4, "expected 4 distinct observed buckets")
    for ((b, np, nn, _) <- census) {
      if (np > 0 && nn == 0) assert(w2(b) > 0, s"bucket $b should be +")
      if (nn > 0 && np == 0) assert(w2(b) < 0, s"bucket $b should be -")
    }
    val w1 = weights(1)
    for ((b, np, nn, _) <- census)
      assert(math.abs(w2(b)) > math.abs(w1(b)),
        s"bucket $b magnitude should grow across iterations")
  }

  test("balanced classes with symmetric vocabulary give a (rounded) " +
    "zero intercept; output is one row per observed bucket plus the " +
    "bucket=-1 bias row") {
    val pos = (0L until 25L).map(i => (i, "alpha shared", true))
    val neg = (25L until 50L).map(i => (i, "beta shared", false))
    val out = TextAnalysis.trainHashedLogReg(
        (pos ++ neg).toDF("doc_id", "text", "y"),
        "doc_id", "text", labelPos = col("y"), buckets = 512, iters = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.count(_._1 == -1L) === 1)
    assert(out.map(_._1).distinct.length === out.length)
    // alpha/beta/shared → 3 observed buckets whp + the bias row
    assert(out.length === 4)
    assert(out.find(_._1 == -1L).get._4 === 0.0)
    // the shared token's bucket is uninformative: weight ~ 0
    val shared = out.filter(r => r._1 >= 0 && r._2 > 0 && r._3 > 0)
    assert(shared.length === 1 && math.abs(shared.head._4) < 1e-6)
  }
}
