package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up generator: replicates an SF directory K× with
  * FK-consistent key-space offsets, for scaling-curve measurements
  * above the largest driver-provided SF (SCALE.md):
  *
  *   sbt "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf1 10"
  *
  * Shape decisions (what "10× the data" should mean for this engine):
  *  - ONE offset per logical key DOMAIN (orderkey, custkey, partkey,
  *    suppkey, user/event ids, doc_id, vec_id), applied to every column
  *    referencing it — joins keep their original per-key fan-out, so
  *    join/agg cardinalities scale linearly, not quadratically;
  *  - documents get a per-replica suffix token (and consistent n_chars)
  *    so near-dup pipelines see a 10× corpus rather than 10 EXACT
  *    copies of every doc — exact copies would inflate every LSH
  *    bucket 10× and the candidate pair space 100×, which measures
  *    "pathological duplication", not "more data";
  *  - embeddings get a per-replica circular rotation, varying
  *    ANN/LSH bucket geometry across replicas for the same reason;
  *  - event timestamps are preserved: the calendar window is FIXED and
  *    per-day volume grows 10× — matching the engine's design
  *    assumption that day/week grains stay metadata-sized at 100 TB
  *    while row grains grow;
  *  - dimension tables (nation, region) copy through unchanged.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <dstDir> <k>")
    val (src, dst, k) = (args(0), args(1), args(2).toInt)
    require(k >= 1, s"k must be >= 1, got $k")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(n: String) = spark.read.parquet(s"$src/$n.parquet")

    // one offset per logical key domain, read from the OWNING table so
    // fact tables referencing the domain shift identically
    def domainOffset(table: String, keyCol: String): Long =
      t(table).agg(max(col(keyCol).cast("long"))).head().getLong(0) + 1L
    val off = Map(
      "orderkey" -> domainOffset("orders", "o_orderkey"),
      "custkey"  -> domainOffset("customer", "c_custkey"),
      "partkey"  -> domainOffset("part", "p_partkey"),
      "suppkey"  -> domainOffset("supplier", "s_suppkey"),
      "eventid"  -> domainOffset("events", "event_id"),
      "userid"   -> domainOffset("events", "user_id"),
      "docid"    -> domainOffset("documents", "doc_id"),
      "vecid"    -> domainOffset("embeddings", "vec_id"))

    /** K replicas of `df`, each key column shifted by r·domainOffset
      * (type-preserving), with an optional per-replica transform.
      * FAILS FAST if the largest shifted key (k·offset − 1) would not
      * fit the source column's type — a silent narrowing cast would
      * wrap 32-bit keys at larger k/SF and corrupt FK consistency of
      * the generated corpus (advisor r07). */
    def replicate(df: DataFrame, keys: Map[String, String],
                  extra: (DataFrame, Int) => DataFrame = (d, _) => d)
        : DataFrame = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      for ((c, dom) <- keys) {
        val typeMax: BigInt = df.schema(c).dataType match {
          case ByteType    => BigInt(Byte.MaxValue)
          case ShortType   => BigInt(Short.MaxValue)
          case IntegerType => BigInt(Int.MaxValue)
          case LongType    => BigInt(Long.MaxValue)
          case other => sys.error(
            s"scale-up key column $c has non-integral type ${other.simpleString}")
        }
        val maxShifted = BigInt(k) * BigInt(off(dom)) - 1
        require(maxShifted <= typeMax,
          s"scale-up k=$k would overflow key column $c " +
            s"(${df.schema(c).dataType.simpleString}): max shifted key " +
            s"$maxShifted > $typeMax — widen the source column or lower k")
      }
      (0 until k).map { r =>
        val shifted = keys.foldLeft(df) { case (d, (c, dom)) =>
          d.withColumn(c, (col(c).cast("long") + lit(r * off(dom)))
            .cast(df.schema(c).dataType))
        }
        extra(shifted, r)
      }.reduce(_ unionByName _)
    }

    def write(df: DataFrame, n: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$n.parquet")
      val rows = spark.read.parquet(s"$dst/$n.parquet").count()
      println(s"[scaleup] $n rows=$rows")
    }

    write(t("nation"), "nation")
    write(t("region"), "region")
    write(replicate(t("customer"), Map("c_custkey" -> "custkey")),
      "customer")
    write(replicate(t("supplier"), Map("s_suppkey" -> "suppkey")),
      "supplier")
    write(replicate(t("part"), Map("p_partkey" -> "partkey")), "part")
    write(replicate(t("orders"),
      Map("o_orderkey" -> "orderkey", "o_custkey" -> "custkey")),
      "orders")
    write(replicate(t("lineitem"),
      Map("l_orderkey" -> "orderkey", "l_partkey" -> "partkey",
        "l_suppkey" -> "suppkey")), "lineitem")
    write(replicate(t("events"),
      Map("event_id" -> "eventid", "user_id" -> "userid")), "events")
    write(replicate(t("documents"), Map("doc_id" -> "docid"),
      (d, r) =>
        if (r == 0) d
        else {
          val suffix = s" corpusreplica r$r"
          d.withColumn("text", concat(col("text"), lit(suffix)))
            .withColumn("n_chars", col("n_chars") + lit(suffix.length.toLong))
        }), "documents")
    write(replicate(t("embeddings"), Map("vec_id" -> "vecid"),
      (d, r) =>
        if (r == 0) d
        else d.withColumn("embedding", expr(
          s"concat(slice(embedding, ${r + 1}, size(embedding) - $r), " +
            s"slice(embedding, 1, $r))"))), "embeddings")
    spark.stop()
  }
}
