package graft

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Similarity}

/** Funnel / cohort analytics and the embedding-space dedup + covariance
  * ops added alongside them. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  test("funnel: strict ordering and the conversion window both gate — " +
    "out-of-order and too-late stages do not convert") {
    val ev = Seq(
      // u1: clean view → click → purchase, all within window
      (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(10)),
      // u2: purchase BEFORE any click — reaches click only
      (2L, "view", ts(0)), (2L, "purchase", ts(1)), (2L, "click", ts(2)),
      // u3: click arrives after the 30-min window — view only
      (3L, "view", ts(0)), (3L, "click", ts(45)),
      // u4: no view at all — not in the funnel
      (4L, "click", ts(0)), (4L, "purchase", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val got = Behavior.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowSeconds = Some(1800L))
      .orderBy("stage_idx").as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((0, "view", 3L), (1, "click", 2L),
      (2, "purchase", 1L)))
    // u2's click(t=2) counts (after view), but no purchase after it
    val times = Behavior.funnelTimes(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), Some(1800L))
    val u2 = times.filter(col("user_id") === 2L).collect()(0)
    assert(u2.getAs[java.sql.Timestamp]("t1") === ts(2) && u2.isNullAt(3))
  }

  test("cohortRetention: first-activity week buckets and offsets count " +
    "distinct users exactly") {
    def wts(week: Int, day: Int = 0) = new java.sql.Timestamp(
      // 1970-01-05 is Monday of week 0 (UTC session)
      (week * 7L + day) * 86400000L + 345600000L)
    val ev = Seq(
      (1L, wts(100)), (1L, wts(100, 3)), (1L, wts(101)), // w100 cohort, wk 0+1
      (2L, wts(100)), (2L, wts(102)),                    // w100 cohort, wk 0+2
      (3L, wts(101))                                     // w101 cohort, wk 0
    ).toDF("user_id", "ts")
    val got = Behavior.cohortRetention(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((100L, 0L, 2L), (100L, 1L, 1L), (100L, 2L, 1L),
      (101L, 0L, 1L)))
  }

  test("semanticDedup: near-exemplar members are dropped, distant " +
    "members and exemplars kept; output partitions the corpus") {
    val e1 = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(8)(i => if (i == 4) 1.0f else 0.0f)
    def near(base: Array[Float], eps: Float) =
      base.zipWithIndex.map { case (v, i) => if (i == 1) eps else v }
    val corpus = Seq(
      (0L, e1), (1L, e2),                    // the centroids themselves
      (2L, near(e1, 0.05f)),                 // ~cos 0.999 to exemplar
      (3L, near(e2, 0.08f)),
      (4L, Array.tabulate(8)(i => if (i == 0) 1.0f else 0.6f)) // distant
    ).toDF("vec_id", "embedding")
    val centroids = corpus.filter(col("vec_id") < 2)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val got = Similarity.semanticDedup(corpus, "vec_id", "embedding",
        centroids, "cid", "cv", threshold = 0.9)
      .orderBy("vec_id")
      .select("vec_id", "keep").as[(Long, Long)].collect().toMap
    // 0 and 1 are their clusters' exemplars (cs = 1.0); 2 and 3 are
    // cos>0.9 to them → dropped; 4 is far from its exemplar → kept
    assert(got === Map(0L -> 1L, 1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("dimCovariance: matches hand-computed covariances (population " +
    "normalization) on a 3-vector corpus") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(2.0f, 4.0f)),
      (3L, Array(3.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.dimCovariance(df, "embedding", dims = 2)
      .orderBy("i", "j").as[(Int, Int, Double)].collect().toSeq
    // x = (1,2,3): mean 2, var 2/3; y = (2,4,0): mean 2, var 8/3
    // cov(x,y) = ((1)(2)+(2)(4)+(3)(0))/3 - 4 = 10/3 - 4 = -2/3
    assert(got === Seq((0, 0, 0.666667), (0, 1, -0.666667),
      (1, 1, 2.666667)))
  }
}
