package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout tools for the 100 TB path: bucketed co-located joins
  * (no exchange at read time) and salted joins for skewed keys.
  *
  * Bucketing: both fact tables written with `bucketBy(n, key)` join
  * WITHOUT any shuffle — the scan's bucketing satisfies the join's
  * distribution requirement. On a petabyte warehouse this converts every
  * repeated fact⋈fact join from a full network shuffle into local work
  * (verified by plan assertion in PartitioningSpec: zero Exchange nodes).
  *
  * Salting: a join key with a hot value (one customer with 10% of all
  * orders) puts 10% of the data in one task. `saltedJoin` spreads each
  * big-side row across `saltFactor` sub-keys and replicates the small
  * side per sub-key — the hot key's work fans out `saltFactor`-wide while
  * total data only grows on the (small) dimension side. AQE's skew-join
  * handles sort-merge cases automatically; explicit salting remains the
  * tool for broadcast-averse or agg-shaped skew.
  */
object Partitioning {

  /** Write a DataFrame as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables — shuffle-free when both were
    * written with `writeBucketed(..., key, n)` for the same n. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Salted equi-join: deterministic per-row salt on the big side,
    * `saltFactor`-way replication of the small side. Result is exactly
    * the plain join's result. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor))
        .cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: phase 1 pre-aggregates on
    * (keys, salt) — a deterministic per-row salt splits any hot key
    * across `saltFactor` reducers — phase 2 combines the partials on
    * the true keys. Exact (not approximate) for associative+commutative
    * aggregates over exact types: counts and integer/decimal sums
    * combine losslessly, so the result equals the plain groupBy's.
    *
    * Honest scale note: for plain sum/count Spark's hash aggregate
    * already does a map-side partial combine, which handles most skew;
    * the explicit salted form is the pattern for when the PARTIAL state
    * itself is per-key-large (large collect-style or distinct-heavy
    * aggregation states), where one reducer would otherwise hold the
    * whole hot key's state. It is exposed on the exact-sum case so its
    * equivalence contract is oracle-checkable. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], value: Column,
                     saltFactor: Int): DataFrame = {
    val salt = pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)),
      lit(saltFactor)).cast("int")
    df.withColumn("__salt", salt)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(value).as("__s"), count(lit(1)).as("__c"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__s")).as("sum_val"), sum(col("__c")).as("cnt"))
  }
}
