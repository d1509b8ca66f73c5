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
}
