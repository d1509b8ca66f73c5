package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-query scaling probe: wall time + total shuffle bytes for named
  * SparkEntry queries at an SF directory — the evidence collector for
  * SCALE.md's measured 10× points.
  *
  *   sbt "runMain graft.ScaleQueryProbe <sfDir> <query> [query...]"
  *
  * Timing methodology matches Bench (full-row xxhash64 reduce, so the
  * measured work equals the verified work); shuffle bytes are summed
  * from completed-stage task metrics (write + read sides reported
  * separately — a query's read can exceed its write when AQE reuses an
  * exchange). Each query runs after the same blocking-unpersist + GC
  * hygiene as Bench so one query's checkpoint blocks never pollute the
  * next measurement. */
object ScaleQueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleQueryProbe <sfDir> <query>...")
    val dir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shufW = new AtomicLong
    val shufR = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    // JVM/codegen/scan warmup off the books (Bench's contract)
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(150); System.gc()
      shufW.set(0L); shufR.set(0L)
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val cols = df.schema.fields.map { f =>
        f.dataType match {
          case _: org.apache.spark.sql.types.MapType => to_json(col(f.name))
          case _ => col(f.name)
        }
      }
      df.select(xxhash64(cols.toIndexedSeq: _*).as("__h"))
        .agg(bit_xor(col("__h"))).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the async listener bus drain stage events
      println(f"[scaleq] $name%-28s $secs%7.2f s  " +
        f"shufW=${shufW.get / 1e6}%9.1f MB  shufR=${shufR.get / 1e6}%9.1f MB")
    }
    spark.stop()
  }
}
