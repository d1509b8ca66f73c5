package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Z-order layout: Morton-code correctness and the write-side contract
  * (range-disjoint files, sorted within each file). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits (x even positions, y odd)") {
    val got = Seq((1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
      .select(Layout.zValue2($"x", $"y", bits = 8))
      .as[Long].collect().toSeq
    // z(3,5): x=011 -> bits 0,1 at even slots 0,2 = 1+4;
    //         y=101 -> bits 0,2 at odd slots 1,5 = 2+32  => 39
    assert(got === Seq(1L, 2L, 39L, 65535L))
  }

  test("zorderWrite produces files with DISJOINT z ranges, sorted inside") {
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val df = (0 until 4096).map(i => (i.toLong % 64, (i.toLong * 7) % 64))
      .toDF("x", "y")
    Layout.zorderWrite(df, "x", "y", s"$dir/t", files = 8, bits = 6)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() === 4096)
    // recompute z per row, group by physical file: ranges must not overlap
    val ranges = back
      .withColumn("z", Layout.zValue2($"x", $"y", bits = 6))
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo")
      .as[(String, Long, Long)].collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array((_, _, hi1), (_, lo2, _)) =>
      assert(hi1 <= lo2, s"file z ranges overlap: $hi1 > $lo2")
    }
    // both dimensions benefit: a selective x predicate touches few files
    val hit = back
      .withColumn("z", Layout.zValue2($"x", $"y", bits = 6))
      .withColumn("f", input_file_name())
      .filter($"x" === 3)
      .select("f").distinct().count()
    assert(hit < 8, s"x=3 should prune at least one of 8 files, hit $hit")
  }
}
