package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the graft-sqlite DSv2 source (SCALE.md §6k): scan
  * throughput vs partition parallelism, pruned-column scans, and the
  * rowid-pushdown point-lookup latency on a multi-hundred-MB .db.
  *
  *   python3 tools/make_sqlite_big.py /tmp/graft_big.db 2000000
  *   sbt "runMain graft.SqliteProbe /tmp/graft_big.db"
  *
  * Evidence targets: the subtree-partitioned scan beats maxPartitions=1
  * by ~min(cores, fan-out); column pruning cuts wall (unwanted bodies
  * are length-skipped, never decoded); a point lookup answers in
  * milliseconds-not-seconds because root-child pruning plans ONE
  * single-subtree partition and the B-tree descent reads O(depth)
  * pages. */
object SqliteProbe {
  def main(args: Array[String]): Unit = {
    val db = args.headOption.getOrElse("/tmp/graft_big.db")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def rd(maxPartitions: Int) = spark.read.format("graft-sqlite")
      .option("table", "big").option("maxPartitions", maxPartitions)
      .load(db)

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val v = f
      println(f"[sqprobe] $name%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($v)")
    }

    val n = rd(32).count() // warm OS page cache so runs compare CPU paths
    println(s"[sqprobe] rows=$n partitions=${rd(32).rdd.getNumPartitions}")
    time("full agg, 32 partitions") {
      rd(32).agg(sum(col("flag")), sum(length(col("body")))).head()
    }
    time("full agg, 1 partition") {
      rd(1).agg(sum(col("flag")), sum(length(col("body")))).head()
    }
    time("pruned 2-col agg (no body decode), 32p") {
      rd(32).agg(sum(col("flag")), sum(col("id"))).head()
    }
    time("point lookup id = n/2 (rowid pushdown)") {
      rd(32).filter(col("id") === n / 2).select("cat", "score").head()
    }
    time("range 1k rows (rowid pushdown)") {
      rd(32).filter(col("id").between(n / 2, n / 2 + 999)).count()
    }
    time("point lookup, pushdown-equivalent full filter, 1p") {
      // the no-pushdown bound: same predicate but forced single subtree
      // set, planner still prunes — compare against a full scan instead
      rd(1).filter(col("cat") === "nope").count()
    }
    // ---- secondary-index eq pushdown (round 10) ----------------------
    // tag is selective (~n/100k rows per value): the index descent
    // resolves the rowid set in O(depth+matches) pages, vs decoding
    // every record under the filter fallback
    if (rd(32).columns.contains("tag")) {
      time("indexed eq lookup tag (selective)") {
        rd(32).filter(col("tag") === "t-012345")
          .agg(count(lit(1)), sum(col("id"))).head()
      }
      time("same predicate, index disabled (full scan)") {
        spark.read.format("graft-sqlite").option("table", "big")
          .option("maxPartitions", 32).option("maxIndexLookupRows", 0)
          .load(db).filter(col("tag") === "t-012345")
          .agg(count(lit(1)), sum(col("id"))).head()
      }
      time("indexed eq lookup cat (UNselective, n/8 matches)") {
        // near-unselective: the honest comparison point for the
        // maxIndexLookupRows fallback default
        rd(32).filter(col("cat") === "zeta")
          .agg(count(lit(1))).head()
      }
    }
    // ---- index RANGE / composite-prefix pushdown (round 11) ----------
    if (rd(32).columns.contains("tag")) {
      // text range on idx_big_tag: 15 tag values ≈ 300 of 2M rows
      time("indexed RANGE on tag (15 values, ~300 rows)") {
        rd(32).filter(col("tag") >= "t-012345" && col("tag") < "t-012360")
          .agg(count(lit(1)), sum(col("id"))).head()
      }
      time("same range, index disabled (full scan)") {
        spark.read.format("graft-sqlite").option("table", "big")
          .option("maxPartitions", 32).option("maxIndexLookupRows", 0)
          .load(db)
          .filter(col("tag") >= "t-012345" && col("tag") < "t-012360")
          .agg(count(lit(1)), sum(col("id"))).head()
      }
      // composite prefix (idx_big_cat_score): eq on an unselective
      // leading column + range on the next = selective compound probe
      time("composite prefix cat eq + score range (~2k rows)") {
        rd(32).filter(col("cat") === "zeta" && col("score") >= 124.0)
          .agg(count(lit(1)), sum(col("id"))).head()
      }
      // unselective range (every row matches tag >= "t-"): the
      // in-descent budget abort must fall back to the scan instead of
      // buffering 2M rowids on the driver
      time("unselective range (tag >= t-, budget abort -> scan)") {
        rd(32).filter(col("tag") >= "t-").agg(count(lit(1))).head()
      }
    }
    // ---- aggregate pushdown (round 10): decode-free count, O(depth)
    // min/max of the rowid alias -------------------------------------
    time("count(*) via aggregate pushdown (decode-free)") {
      rd(32).agg(count(lit(1))).head()
    }
    time("min/max rowid via aggregate pushdown") {
      rd(32).agg(min(col("id")), max(col("id"))).head()
    }
    // ---- WAL overlay overhead (round 10): pass the WAL variant as
    // arg 2 (make_sqlite_big.py ... walpct>0) ------------------------
    args.lift(1).foreach { walDb =>
      def rdw(mp: Int) = spark.read.format("graft-sqlite")
        .option("table", "big").option("maxPartitions", mp).load(walDb)
      val wn = rdw(32).count()
      println(s"[sqprobe] wal variant rows=$wn")
      time("full agg through the WAL overlay, 32p") {
        rdw(32).agg(sum(col("flag")), sum(length(col("body")))).head()
      }
      time("point lookup through the WAL overlay") {
        rdw(32).filter(col("id") === wn / 2).select("cat", "score").head()
      }
    }
    spark.stop()
  }
}
