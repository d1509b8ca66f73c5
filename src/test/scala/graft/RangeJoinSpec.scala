package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** Bucketed range join: equals the naive theta join, plans as an
  * equi-join (no nested loop / cartesian), and handles boundary and
  * null rows per SQL semantics. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("pointInInterval equals the naive theta join (incl. intervals " +
    "spanning multiple buckets and points matching several intervals)") {
    val points = (0 until 200).map(i =>
      (i.toLong, ts(f"2024-01-${1 + i % 28}%02d ${i % 24}%02d:30:00")))
      .toDF("pid", "p")
    val intervals = Seq(
      (1L, ts("2024-01-02 12:00:00"), ts("2024-01-05 00:00:00")), // 3 buckets
      (2L, ts("2024-01-04 00:00:00"), ts("2024-01-04 23:59:59")), // overlaps 1
      (3L, ts("2024-01-20 06:00:00"), ts("2024-01-20 07:00:00")), // sub-day
      (4L, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00"))  // no points
    ).toDF("iid", "s", "e")
    val naive = points.join(intervals, $"p" >= $"s" && $"p" < $"e")
      .select("pid", "iid").orderBy("pid", "iid")
    val bucketed = RangeJoin.pointInInterval(points, "p", intervals, "s", "e")
      .select("pid", "iid").orderBy("pid", "iid")
    assert(bucketed.collect().toSeq === naive.collect().toSeq)
    assert(naive.count() > 0) // the scenario actually matches something
  }

  test("exclusive end: a point exactly at interval end does not match; " +
    "at start it does") {
    val points = Seq((1L, ts("2024-01-02 00:00:00"))).toDF("pid", "p")
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")), // p == end
      (11L, ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00"))  // p == start
    ).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e")
      .select("iid").as[Long].collect().toSeq
    assert(got === Seq(11L))
  }

  test("plans as an equi join on the bucket — no BroadcastNestedLoopJoin " +
    "or CartesianProduct") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rj").toString
    (0 until 1000).map(i => (i.toLong, ts(f"2024-01-${1 + i % 28}%02d 12:00:00")))
      .toDF("pid", "p").write.mode("overwrite").parquet(s"$dir/p")
    (0 until 50).map(i =>
      (i.toLong, ts(f"2024-01-${1 + i % 28}%02d 00:00:00"),
        ts(f"2024-01-${1 + i % 28}%02d 23:00:00")))
      .toDF("iid", "s", "e").write.mode("overwrite").parquet(s"$dir/i")
    val joined = RangeJoin.pointInInterval(
      spark.read.parquet(s"$dir/p"), "p",
      spark.read.parquet(s"$dir/i"), "s", "e")
    joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must stay on the equi-join path, got:\n$plan")
  }
}
