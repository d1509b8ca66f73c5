package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the sign-LSH similarity family (SCALE.md §6g):
  * prints the CANDIDATE-PAIR SPACE (Σ c·(c−1)/2 over bucket occupancy)
  * and wall time of the bucketed near-dup + kNN joins as a function of
  * corpus size and planes-per-table.
  *
  *   sbt "runMain graft.ScaleProbe <sfDir> <planesPerTable>"
  *
  * Evidence target: with FIXED planes, candidate density per bucket
  * grows linearly with the corpus, so pair work grows ~quadratically —
  * the super-linear wall-time curve measured for q23/q91 on the 10×
  * replica set. Growing planes with log₂(corpus) holds per-bucket
  * density (and the pair space per row) roughly constant, which is the
  * deployment rule at 100 TB: bucket count is a function of corpus
  * size, not a constant.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val planes = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val v = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($v)")
    }
    // pair space: how many candidate pairs the bucket self-join would
    // enumerate (before any cap / threshold) — the quantity that must
    // stay ~linear in n for the operator family to scale
    time(s"pairSpace n=$n planes=$planes") {
      graft.ops.Similarity
        .lshBandKeys(emb, "vec_id", "embedding", planes, 8, 64)
        .groupBy("band_key").agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) / 2"))).head().getDouble(0).toLong
    }
    time(s"neardup   n=$n planes=$planes") {
      graft.ops.Similarity.cosineNearDupPairsBucketed(
        emb, "vec_id", "embedding", 0.4, planes, 8, 64).count()
    }
    time(s"knnJoin   n=$n planes=$planes") {
      graft.ops.Similarity.knnJoin(
        emb, "vec_id", "embedding", 3, planes, 8, 64).count()
    }
    spark.stop()
  }
}
