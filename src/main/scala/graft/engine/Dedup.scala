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
    // Phase 1 — local rank WITHOUT a window: after the explicit local
    // sort, monotonically_increasing_id() encodes exactly
    // (partition id << 33) | 0-based-arrival-index, and within a sorted
    // partition the arrival index IS the local rank. The former
    // row_number() over Window.partitionBy(spark_partition_id())
    // reshuffled the ENTIRE input a second time (Catalyst cannot know
    // pid-clustering is inherent, so it inserted
    // Exchange hashpartitioning(__graft_pid) over the range exchange —
    // measured as a full extra corpus shuffle in every numberRows
    // caller, r13). mid is nondeterministic, so Catalyst never reorders
    // it across the Sort; it is used ONLY as (pid, position-in-sorted-
    // partition), which is as deterministic as the two-phase scheme
    // itself.
    val withLocal = ranged.sortWithinPartitions(order)
      .withColumn("__graft_mid", monotonically_increasing_id())
      .withColumn("__graft_pid",
        shiftright(col("__graft_mid"), 33).cast("int"))
      .withColumn("__graft_local",
        (col("__graft_mid") % lit(1L << 33)) + lit(1L))
      .drop("__graft_mid")
    // Phase 2 — exclusive prefix offsets from partition SIZES, computed
    // straight off the ranged frame: no sort on this branch (the old
    // form re-derived the full window chain just to count rows per
    // partition). Both branches read the SAME canonicalized range
    // exchange, so ReuseExchange guarantees identical partition
    // boundaries (the correctness hinge of every two-phase form here,
    // unchanged from the window-based implementation).
    val offsets = ranged
      .select(spark_partition_id().as("__graft_pid"))
      .groupBy(col("__graft_pid"))
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

  /** Two-phase global rank + running sums: like [[numberRows]], but also
    * emits, for each `(name, expr)` in `sums`, the INCLUSIVE running sum
    * of `expr` under the global `order` — all without a single-partition
    * sort. Phase 1 range-partitions on `order` and computes the local
    * rank/cumsums per partition; phase 2 broadcasts a partition-count-
    * grain offsets table (exclusive prefix of per-partition counts and
    * totals) back onto the rows. This is the scale-safe form of
    * `row_number()/sum().over(Window.orderBy(...))` for frames that grow
    * with a dimension or with distinct values (ABC cumulative shares,
    * Mann–Whitney cumulative counts, exact quantile-by-rank).
    *
    * Unlike [[numberRows]] (r13 rewrite), this form KEEPS the
    * pid-partitioned window and therefore pays the hash re-exchange on
    * `__graft_pid` that Catalyst inserts: the running sums need a
    * sequential per-partition scan, and expressing that without a
    * window would mean type-dispatching accumulator code in
    * mapPartitions (long/double/decimal sums each with their own
    * ordering semantics). Its callers run on VALUE-grain frames
    * (distinct values of one column), not the raw corpus, so the extra
    * exchange moves grain-sized data — an accepted trade, documented
    * rather than hidden. */
  def numberAndRunningSum(df: DataFrame, order: Column, rankCol: String,
                          sums: Seq[(String, Column)]): DataFrame = {
    val ranged = df.repartitionByRange(order)
      .withColumn("__graft_pid", spark_partition_id())
    val pw = Window.partitionBy(col("__graft_pid")).orderBy(order)
    var withLocal = ranged.withColumn("__graft_local", row_number().over(pw))
    for (((_, ex), i) <- sums.zipWithIndex)
      withLocal = withLocal.withColumn(s"__graft_ls$i",
        sum(ex).over(pw.rowsBetween(Window.unboundedPreceding, 0)))
    val offAggs = count(lit(1)).as("__graft_cnt") +:
      sums.zipWithIndex.map { case ((_, ex), i) => sum(ex).as(s"__graft_t$i") }
    val perPid = withLocal.groupBy(col("__graft_pid"))
      .agg(offAggs.head, offAggs.tail: _*)
    // exclusive prefix over partition ids — partition-count-grain frame
    val ow = Window.orderBy(col("__graft_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    var offsets = perPid.withColumn("__graft_off",
      coalesce(sum(col("__graft_cnt")).over(ow), lit(0L)))
    for (i <- sums.indices)
      offsets = offsets.withColumn(s"__graft_so$i",
        coalesce(sum(col(s"__graft_t$i")).over(ow), lit(0L)))
    val offCols = col("__graft_pid") +: col("__graft_off") +:
      sums.indices.map(i => col(s"__graft_so$i"))
    var out = withLocal
      .join(broadcast(offsets.select(offCols: _*)), Seq("__graft_pid"))
      .withColumn(rankCol, col("__graft_local") + col("__graft_off"))
    for (((nm, _), i) <- sums.zipWithIndex)
      out = out.withColumn(nm, col(s"__graft_ls$i") + col(s"__graft_so$i"))
    out.drop("__graft_pid" +: "__graft_local" +: "__graft_off" +:
      sums.indices.flatMap(i => Seq(s"__graft_ls$i", s"__graft_so$i")): _*)
  }

  /** Reference-faithful patient numbering: number BEFORE dedup (so dropped
    * duplicates leave gaps — verified behavior, SURVEY.md §2 P5), then
    * keep-first dedup on `keys`. */
  def numberThenDedup(df: DataFrame, keys: Seq[String], order: Column,
                      numCol: String): DataFrame =
    keepFirst(numberRows(df, order, numCol), keys, order)
}
