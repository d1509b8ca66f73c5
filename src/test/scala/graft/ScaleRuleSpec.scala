package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** SCALE.md §6g's deployment rule as a machine-checked property: the
  * sign-LSH candidate PAIR SPACE per row (Σ c·(c−1)/2 over bucket
  * occupancy, divided by corpus rows) stays bounded when the plane
  * count grows with log₂(corpus), and grows ~linearly per row
  * (quadratically overall) when the blocking geometry is held fixed.
  * The 10× corpus is built the ScaleUp way — deterministic circular
  * rotations — so the spec is exact and repeatable. */
class ScaleRuleSpec extends SparkSpec {

  test("adaptivePlanes: ceil(log2(n/targetBucketRows)), floored at " +
    "minPlanes and capped at 20") {
    assert(Similarity.adaptivePlanes(500) === 4) // needs 2, floor wins
    assert(Similarity.adaptivePlanes(5000) === 6)
    assert(Similarity.adaptivePlanes(50000) === 9)
    assert(Similarity.adaptivePlanes(125L << 30) === 20) // cap
    assert(Similarity.adaptivePlanes(1) === 4)
  }

  test("pair space per row: ~flat under adaptive planes, ~10x under " +
    "fixed planes, on a deterministic 10x rotated corpus") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = base.count()
    val big = (0 until 10).map { r =>
      if (r == 0) base
      else base.select((col("vec_id") + lit(r * 100000L)).as("vec_id"),
        expr(s"concat(slice(embedding, ${r + 1}, size(embedding) - $r)," +
          s" slice(embedding, 1, $r))").as("embedding"))
    }.reduce(_ unionByName _)
    val bigN = big.count()
    assert(bigN === n * 10)

    def pairSpacePerRow(df: org.apache.spark.sql.DataFrame, rows: Long,
                        planes: Int): Double =
      Similarity.lshBandKeys(df, "vec_id", "embedding", planes, 8, 64)
        .groupBy("band_key").agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) / 2"))).head().getDouble(0) / rows

    val planesBase = Similarity.adaptivePlanes(n)
    val planesBig = Similarity.adaptivePlanes(bigN)
    assert(planesBig > planesBase, "the rule must actually add planes")
    val basePP = pairSpacePerRow(base, n, planesBase)
    val fixedPP = pairSpacePerRow(big, bigN, planesBase)
    val adaptPP = pairSpacePerRow(big, bigN, planesBig)
    // fixed geometry: per-row pair work scales with the corpus (the
    // quadratic regime measured at the sf1 point)
    assert(fixedPP > 4 * basePP, s"fixed=$fixedPP base=$basePP")
    // adaptive geometry: bounded per-row pair work
    assert(adaptPP < 3 * basePP, s"adapt=$adaptPP base=$basePP")
    assert(adaptPP < fixedPP / 2, s"adapt=$adaptPP fixed=$fixedPP")
  }
}
