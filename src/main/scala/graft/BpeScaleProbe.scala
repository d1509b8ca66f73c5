package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Above-toy-scale BPE training point (SCALE.md §6j; judge r08 "Next
  * round" #5): train ~1k merges on the sf0.1 documents vocabulary with
  * [[graft.ops.TextAnalysis.bpeTrainBatched]], and measure what the
  * batching actually buys — Spark JOB COUNT (the driver-round-trip
  * currency the batched trainer optimizes) and wall time vs the
  * sequential trainer's extrapolation from a measured 64-merge run.
  *
  *   sbt "runMain graft.BpeScaleProbe [targetMerges] [batch] [sfDir]"
  *
  * Evidence target: jobs ≈ rounds·k (k = jobs per round: one pair-count
  * collect + one checkpoint materialization + small constants), rounds
  * ≈ merges/batch-accepted, and wall grows with ROUNDS, not MERGES —
  * the sequential trainer pays the same per-round cost per single
  * merge. The synthetic corpus's whole vocabulary MERGES TO CLOSURE in
  * well under 1k merges (measured: 89 at sf0.1), so the honest
  * comparison is both trainers run to closure; the 4th arg sizes the
  * sequential run (0 skips it — e.g. when probing a 100× corpus where
  * only the batched scan matters). */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.map(_.toInt).getOrElse(1000)
    val batch = if (args.length > 1) args(1).toInt else 32
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val seqMerges = if (args.length > 3) args(3).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm the scan outside the measured regions

    def run(name: String)(f: => Long): Unit = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val merges = f
      val dt = (System.nanoTime() - t0) / 1e9
      val dj = jobs.get() - j0
      println(f"[bpe] $name%-28s merges=$merges%5d jobs=$dj%6d " +
        f"wall=$dt%8.1f s  (${dt / merges}%6.3f s/merge, " +
        f"${dj.toDouble / merges}%5.1f jobs/merge)")
    }

    // sequential reference point — per-merge cost extrapolates linearly
    // (one pair-count round trip per merge by construction); at
    // seqMerges above the closure point this measures run-to-closure
    if (seqMerges > 0) run(s"sequential n=$seqMerges") {
      graft.ops.TextAnalysis.bpeTrain(docs, "text", seqMerges).count()
    }
    // batched: rounds sized so accepted merges reach ~target even with
    // conflict-rejected candidates (acceptance observed ≥ batch/2)
    val rounds = math.max(1, (target * 2) / batch)
    run(s"batched n≈$target b=$batch") {
      graft.ops.TextAnalysis.bpeTrainBatched(docs, "text", rounds, batch)
        .count()
    }
    spark.stop()
  }
}
