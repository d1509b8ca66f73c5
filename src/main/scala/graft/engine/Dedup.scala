package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-aware dedup — the reference's `drop_duplicates(subset=...)`
  * keep-first semantics (`exo_1.py:32-34`) and the pre-dedup surrogate
  * numbering (`exo_1.py:53,123-131`), which together produce the verified
  * PATIENT_NUM-gap behavior (SURVEY.md §2 P5/J1).
  *
  * Spark has no input row order, so "first" is defined by an explicit
  * order column supplied by the staging layer (a file row index or
  * `monotonically_increasing_id()` captured at scan — SURVEY.md §7.4).
  *
  * Scale notes: `keepFirst` is one hash-partitioned window (shuffle on the
  * dedup keys only — no global sort); at 100 TB this is the same shuffle an
  * aggregation on those keys would need, and skewed key groups are handled
  * by AQE. `numberRows` with a global order is inherently a two-phase
  * operation; the per-partition-offset implementation below never sorts
  * globally and never collects rows to the driver.
  */
object Dedup {

  /** J1 — keep the first row per key group under `order`. */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** P5/A2 — dense 1-based row numbering by `order`, without a global
    * single-partition sort: sort within partitions, then add per-partition
    * offsets computed from partition sizes (zipWithIndex-style, but staying
    * in the DataFrame API). `order` must be globally monotone across
    * partitions for the numbering to equal a global `row_number()` —
    * callers get that by range-partitioning on `order` first. */
  def numberRows(df: DataFrame, order: Column, as: String, partitions: Int = 0): DataFrame = {
    val ranged = if (partitions > 0) df.repartitionByRange(partitions, order)
                 else df.repartitionByRange(order)
    val withLocal = ranged
      .withColumn("__graft_pid", spark_partition_id())
      .withColumn("__graft_local",
        row_number().over(Window.partitionBy(col("__graft_pid")).orderBy(order)))
    val offsets = withLocal.groupBy(col("__graft_pid"))
      .agg(count(lit(1)).as("__graft_cnt"))
      .withColumn("__graft_off",
        coalesce(sum(col("__graft_cnt"))
          .over(Window.orderBy(col("__graft_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__graft_pid"), col("__graft_off"))
    withLocal
      .join(broadcast(offsets), Seq("__graft_pid"))
      .withColumn(as, col("__graft_local") + col("__graft_off"))
      .drop("__graft_pid", "__graft_local", "__graft_off")
  }

  /** Reference-faithful patient numbering: number BEFORE dedup (so dropped
    * duplicates leave gaps — verified behavior, SURVEY.md §2 P5), then
    * keep-first dedup on `keys`. */
  def numberThenDedup(df: DataFrame, keys: Seq[String], order: Column,
                      numCol: String): DataFrame =
    keepFirst(numberRows(df, order, numCol), keys, order)
}
