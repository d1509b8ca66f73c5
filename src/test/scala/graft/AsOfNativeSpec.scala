package graft

import org.apache.spark.sql.functions._

import graft.ops.AsOf
import graft.plans.AsOfJoinPlan

/** Native AsOfJoinExec (custom LogicalPlan + Strategy + SparkPlan) versus
  * the composed union+window form — result-equal on randomized data with
  * ties, no-match rows, and multiple partitions. */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def randomData(seed: Int) = {
    val rng = new scala.util.Random(seed)
    val left = (1 to 500).map { i =>
      (rng.nextInt(20).toLong, rng.nextInt(1000).toLong, s"L$i")
    }.toDF("k", "t", "lv")
    // rt unique per i so both forms' arbitrary tie-break among identical
    // (k, rt) right rows cannot differ
    val right = (1 to 300).map { i =>
      (rng.nextInt(25).toLong, i.toLong * 3, s"R$i")
    }.toDF("k", "rt", "rv")
    (left, right)
  }

  test("native as-of join equals the composed union+window form " +
    "(500x300 random rows, keys with ties and no matches)") {
    val (left, right) = randomData(11)
    val native2 = AsOfJoinPlan.asofJoin(left, right, "k", "t", "rt")
    val composed = AsOf.join(left, right.select("k", "rt", "rv"),
      "k", "t", "rt", valueCols = Seq("rv"))
      .select(col("k"), col("t"), col("lv"),
        col("asof_rv").as("rv"), col("asof_rt").as("rt"))

    val n = native2.select(col("k"), col("t"), col("lv"),
        col("asof_rv").as("rv"), col("asof_rt").as("rt"))
      .orderBy("k", "t", "lv", "rv").collect().toSeq
    val c = composed.select("k", "t", "lv", "rv", "rt")
      .orderBy("k", "t", "lv", "rv").collect().toSeq
    assert(n.size === 500 && n === c)
  }

  test("ties: a right row at exactly leftTime matches (<= semantics)") {
    val left = Seq((1L, 100L, "l")).toDF("k", "t", "lv")
    val right = Seq((1L, 100L, "exact"), (1L, 99L, "before"),
      (1L, 101L, "after")).toDF("k", "rt", "rv")
    val got = AsOfJoinPlan.asofJoin(left, right, "k", "t", "rt")
      .select("asof_rv").as[String].collect().toSeq
    assert(got === Seq("exact"))
  }

  test("no prior right row -> right side NULL") {
    val left = Seq((1L, 50L, "l1"), (2L, 50L, "l2")).toDF("k", "t", "lv")
    val right = Seq((1L, 60L, "late")).toDF("k", "rt", "rv")
    val got = AsOfJoinPlan.asofJoin(left, right, "k", "t", "rt")
      .select("lv", "asof_rv").as[(String, Option[String])].collect().toMap
    assert(got === Map("l1" -> None, "l2" -> None))
  }

  test("the physical plan contains the custom exec node") {
    val (left, right) = randomData(7)
    val df = AsOfJoinPlan.asofJoin(left, right, "k", "t", "rt")
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("null keys and times: null never matches (both forms agree and " +
    "neither crashes)") {
    val left = Seq(
      (Some(1L), Some(100L), "match"),
      (None: Option[Long], Some(100L), "nullkey"),
      (Some(1L), None: Option[Long], "nulltime"),
      (None: Option[Long], None: Option[Long], "allnull")
    ).toDF("k", "t", "lv")
    val right = Seq(
      (Some(1L), Some(50L), "r1"),
      (None: Option[Long], Some(40L), "rnullkey"), // never matches anyone
      (Some(1L), None: Option[Long], "rnulltime") // never matches anyone
    ).toDF("k", "rt", "rv")
    val native = AsOfJoinPlan.asofJoin(left, right, "k", "t", "rt")
      .select("lv", "asof_rv").as[(String, Option[String])].collect().toMap
    val composed = AsOf.join(left, right, "k", "t", "rt", Seq("rv"))
      .select("lv", "asof_rv").as[(String, Option[String])].collect().toMap
    val want = Map("match" -> Some("r1"), "nullkey" -> None,
      "nulltime" -> None, "allnull" -> None)
    assert(native === want)
    assert(composed === want)
  }

  test("null value column: all asof_ columns come from the SAME (latest) " +
    "right row, not mixed across rows") {
    val left = Seq((1L, 20L, "l")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 5L, Some("old")),
      (1L, 10L, None: Option[String]) // latest right row has a null value
    ).toDF("k", "rt", "rv")
    val got = AsOf.join(left, right, "k", "t", "rt", Seq("rv"))
      .select("asof_rt", "asof_rv").as[(Long, Option[String])]
      .collect().toSeq
    assert(got === Seq((10L, None))) // rt=10 row wins; its rv IS null
  }

  test("string keys: remembered key survives projection buffer reuse " +
    "(randomized equivalence)") {
    val rng = new scala.util.Random(23)
    val left = (1 to 300).map { i =>
      (s"user-${rng.nextInt(15)}", rng.nextInt(1000).toLong, s"L$i")
    }.toDF("k", "t", "lv")
    val right = (1 to 200).map { i =>
      (s"user-${rng.nextInt(18)}", i.toLong * 4, s"R$i")
    }.toDF("k", "rt", "rv")
    val n = AsOfJoinPlan.asofJoin(left, right, "k", "t", "rt")
      .select(col("k"), col("t"), col("lv"), col("asof_rv").as("rv"))
      .orderBy("k", "t", "lv", "rv").collect().toSeq
    val c = AsOf.join(left, right, "k", "t", "rt", Seq("rv"))
      .select(col("k"), col("t"), col("lv"), col("asof_rv").as("rv"))
      .orderBy("k", "t", "lv", "rv").collect().toSeq
    assert(n.size === 300 && n === c)
  }
}
