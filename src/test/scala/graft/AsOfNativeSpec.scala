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
}
