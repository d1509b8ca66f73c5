package graft

import org.apache.spark.sql.SparkSession

/** Stage profiler for the text-dedup hot path — used to find and fix the
  * interpreted-lambda CSE hazards (see DedupOps scaladoc). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    time("warmup-count")(docs.count())
    time("minhash-signatures")(graft.ops.DedupOps.minhashSignatures(
      docs, "doc_id", "text").count())
    time("minhash-cand-cap10")(graft.ops.DedupOps.minhashCandidates(
      docs, "doc_id", "text", maxBucket = 10).count())
    time("jaccard-verified")(graft.ops.DedupOps.jaccardVerifiedPairs(
      docs, "doc_id", "text", threshold = 0.5, maxBucket = 10).count())
    time("simhash")(graft.ops.DedupOps.simhash(docs, "doc_id", "text").count())
    spark.stop()
  }
}
