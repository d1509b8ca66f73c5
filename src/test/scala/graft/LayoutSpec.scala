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

  test("HilbertIndex2: codegen agrees with the interpreted reference; " +
    "consecutive indices are always grid-adjacent (the locality property " +
    "Morton lacks); SQL surface works with a literal bits arg") {
    import graft.functions.HilbertIndex2
    // bits=1 quadrant order: (0,0) (0,1) (1,1) (1,0)
    assert(Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L))
      .map { case (x, y) => HilbertIndex2.xy2d(x, y, 1) } === Seq(0L, 1L, 2L, 3L))
    // whole-curve adjacency at bits=4: d and d+1 differ by exactly one
    // unit step in exactly one coordinate
    val n = 16
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield HilbertIndex2.xy2d(x, y, 4) -> (x, y)).toMap
    (0L until (n * n - 1).toLong).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve jumps between d=$d ($x1,$y1) and ${d + 1} ($x2,$y2)")
    }
    // distributed codegen path = reference, on a real scan
    val dir = java.nio.file.Files.createTempDirectory("graft_h").toString
    (0 until 512).map(i => (i.toLong % 23, (i.toLong * 13) % 29))
      .toDF("x", "y").write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val rows = back
      .select($"x", $"y", Layout.hilbertValue2($"x", $"y", bits = 5).as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) ===
        HilbertIndex2.xy2d(r.getLong(0), r.getLong(1), 5))
    }
    // SQL surface (post-hoc registration, shared session)
    graft.functions.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT hilbert_index2(CAST(3 AS BIGINT), CAST(5 AS BIGINT), 4) AS h")
      .head().getLong(0)
    assert(viaSql === HilbertIndex2.xy2d(3, 5, 4))
  }

  test("hilbert curve beats morton on locality: smaller mean index gap " +
    "between grid-adjacent cells") {
    import graft.functions.HilbertIndex2
    val n = 32
    def meanAdjacentGap(idx: (Long, Long) => Long): Double = {
      val gaps = for (x <- 0L until n; y <- 0L until (n - 1))
        yield math.abs(idx(x, y + 1) - idx(x, y)).toDouble
      gaps.sum / gaps.size
    }
    val hilbert = meanAdjacentGap(HilbertIndex2.xy2d(_, _, 5))
    val morton = meanAdjacentGap((x, y) =>
      (0 until 5).map(i => (((x >> i) & 1) << (2 * i)) +
        (((y >> i) & 1) << (2 * i + 1))).sum)
    assert(hilbert < morton,
      s"hilbert mean gap $hilbert should beat morton $morton")
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
