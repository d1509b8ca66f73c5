package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch component profiler for heavy-query decomposition (transient —
  * not part of the library surface). */
object ProfScratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    def hashed(df: org.apache.spark.sql.DataFrame): Long = {
      val cols = df.schema.fields.map(f => col(f.name))
      df.select(xxhash64(cols.toIndexedSeq: _*).as("__h"))
        .agg(bit_xor(col("__h"))).collect()
      1L
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val vals = li.select(col("l_extendedprice").cast("double").as("v"))
    time("warmup-count")(vals.count())
    val probes = Seq(1, 5, 25, 50, 75, 90, 99)
    val sk = (c: org.apache.spark.sql.Column) => graft.functions.KllQuantiles
      .kllQuantiles(c, 512, probes.map(_ / 100.0))
    // run the whole list twice; read the SECOND round (JIT warm)
    for (round <- 1 to 2) {
      time(s"r$round-exact-percentile")(hashed(vals.agg(
        expr(s"percentile(v, array(${probes.map(_ / 100.0).mkString(",")}))")
          .as("exacts"))))
      time(s"r$round-approx-percentile")(hashed(vals.agg(
        percentile_approx(col("v"), typedlit(probes.map(_ / 100.0)),
          lit(10000)).as("a"))))
      time(s"r$round-native-sketch")(hashed(vals.agg(sk(col("v")).as("ests"))))
      time(s"r$round-count-only")(hashed(vals.agg(count(lit(1)).as("n"))))
      time(s"r$round-full-q151")(hashed(
        SparkEntry.queries("q151_kll_quantile_bound")(spark, dir)))
    }
    spark.stop()
  }
}
