package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter (local
    // iteration aid; the driver always runs the full set)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
      // default; read as long (ns since epoch) and convert in the queries.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
    // SPARK_GRAFT_ADVERSE=1: hostile physical-planner settings — results
    // must be IDENTICAL (correctness may not depend on exchange reuse,
    // auto-broadcast size estimates, AQE coalescing geometry, input
    // split boundaries, or the shuffle partition count). This is the
    // plan-shape-independence soak the r13 numberRows bug motivated: it
    // hid behind ReuseExchange firing and single-partition coalescing
    // at oracle scale. An odd partition count + tiny split/advisory
    // sizes maximize boundary diversity; reuse off forces every
    // exchange to stand alone.
    val adverse = sys.env.get("SPARK_GRAFT_ADVERSE").contains("1")
    if (adverse) {
      builder
        .config("spark.sql.exchange.reuse", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.sql.files.maxPartitionBytes", "1m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Auto-geometry guard: q23/q91/q298 derive sign-LSH planes from the
    // embeddings count (targetBucket 125 / 32); their DuckDB oracles pin
    // 4 hyperplanes. Any verify tier whose derived geometry is not 4
    // would silently hash-mismatch (advisor r08) — fail fast with the
    // cause instead.
    val autoGeomQueries = Set("q23_embedding_neardup_lsh", "q91_knn_join",
      "q298_hubness")
    if (only.forall(f => autoGeomQueries.exists(f.contains))) {
      val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
      for (tb <- Seq(32L, 125L)) {
        val derived = graft.ops.Similarity.adaptivePlanes(n, tb)
        require(derived == 4, s"verify tier $sfDir has $n embeddings → " +
          s"$derived derived planes at targetBucket=$tb, but the " +
          "q23/q91/q298 oracles pin 4 — run Verify at sf0.01 or re-pin " +
          "the oracle hyperplane range")
      }
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
