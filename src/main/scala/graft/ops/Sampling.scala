package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.TextFunctions

/** Reproducible sampling and dataset splitting for training pipelines.
  *
  * Everything is HASH-based, not RNG-based: `rand()` changes with
  * partitioning/retries and can never be replayed by another engine,
  * while `md5(key) mod N` gives every row a stable bucket any engine
  * computes identically (the DuckDB oracles replay these bit-for-bit).
  * This is how production corpus pipelines do splits: membership is a
  * pure function of the record key, so re-runs, backfills, and joins
  * against other systems all agree. Map-side only — no shuffle.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a key column (+ salt so
    * different experiments draw independent assignments). */
  def hashBucket(key: Column, buckets: Int = 100, salt: String = ""): Column =
    pmod(TextFunctions.md5Hash48(concat(key.cast("string"), lit(salt))),
      lit(buckets.toLong))

  /** Deterministic `pct`% sample. */
  def sampled(df: DataFrame, key: String, pct: Int,
              salt: String = ""): DataFrame =
    df.filter(hashBucket(col(key), 100, salt) < pct)

  /** Train/validation/test assignment with the given percentages
    * (must sum to <= 100; remainder goes to "test"). */
  def split(key: Column, trainPct: Int = 80, valPct: Int = 10,
            salt: String = ""): Column = {
    val b = hashBucket(key, 100, salt)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** DOMAIN-MIX sampling: keep each row with a per-domain rate (percent
    * by the value of `domainCol`) — how a pretraining mix up- or
    * down-weights sources (e.g. wiki 100%, crawl 30%). Membership is
    * hash-of-key as everywhere here: deterministic, replayable,
    * map-side only; unknown domains get `defaultPct`. */
  def domainMix(df: DataFrame, key: String, domainCol: String,
                pctByDomain: Map[String, Int], defaultPct: Int = 100,
                salt: String = ""): DataFrame = {
    val pct = pctByDomain.foldLeft(lit(defaultPct)) { case (acc, (d, p)) =>
      when(col(domainCol) === d, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(key), 100, salt) < pct)
  }

  /** EXACTLY-n-per-stratum deterministic sample: rank rows inside each
    * stratum by a salted hash of the key (key itself as tiebreak) and
    * keep the first n. Unlike `sampled` (a fixed RATE), this draws a
    * fixed SIZE per group — eval sets, per-language caps, debugging
    * slices. Still a pure function of (key, salt): any engine replays
    * the same membership. One shuffle on the strata; the per-stratum
    * sort is bounded by the stratum, and Spark's WindowGroupLimit pushes
    * the rank<=n cut below the shuffle, so map tasks emit at most n rows
    * per stratum each, not the stratum. */
  def stratifiedTake(df: DataFrame, strata: Seq[String], key: String,
                     n: Int, salt: String = ""): DataFrame = {
    val h = TextFunctions.md5Hash48(
      concat(lit(salt), lit(":"), col(key).cast("string")))
    val w = Window.partitionBy(strata.map(col): _*).orderBy(h, col(key))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** WEIGHTED sampling without replacement, k rows, deterministic:
    * Efraimidis–Spirakis A-ES with the uniform draw replaced by the
    * hash — each row gets u = (md5_48(key+salt)+0.5)/2^48 in (0,1) and
    * priority ln(u)/w (a monotone transform of the classic u^(1/w), so
    * the induced distribution is the same: P(row first) proportional to
    * its weight); the k largest priorities win. Replayable: membership
    * is a pure function of (key, salt, weight), so the oracle, a rerun,
    * or a backfill selects the identical k rows. Scale shape: priority
    * is map-side arithmetic; the global top-k is TakeOrderedAndProject
    * (per-partition partial top-k, k rows per partition to the driver
    * merge — never a full sort of the corpus). */
  def weightedSample(df: DataFrame, key: String, weight: Column, k: Int,
                     salt: String = ""): DataFrame = {
    val h = TextFunctions.md5Hash48(
      concat(col(key).cast("string"), lit(salt)))
    val u = (h.cast("double") + lit(0.5)) / lit(281474976710656.0) // 2^48
    df.withColumn("__pri", log(u) / weight.cast("double"))
      .orderBy(col("__pri").desc, col(key))
      .limit(k)
      .drop("__pri")
  }
}
