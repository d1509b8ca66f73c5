package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout for multi-dimensional scan pruning.
  *
  * A parquet table sorted on one column prunes row groups only for
  * predicates on that column. Z-ORDERING (bit-interleaved Morton codes)
  * sorts on a space-filling curve over SEVERAL columns at once, so each
  * file's min/max footer ranges stay narrow in EVERY interleaved
  * dimension — a `WHERE x = … AND y BETWEEN …` scan skips most files on
  * either predicate. At 100 TB this is the difference between "sorted
  * helps one query family" and "one layout serves the whole dashboard".
  *
  * The z-value is pure codegen'd bit arithmetic (shift/and/or built-ins,
  * no UDF), so computing it is map-side work during the write, and the
  * layout job itself is one `repartitionByRange` (sampled range
  * exchange) + per-partition sort — the same cost as any sorted write.
  */
object Layout {

  /** 2-D Morton (z-order) code: interleaves the low `bits` bits of two
    * non-negative integer columns (x in even positions, y in odd).
    * Monotone locality: nearby (x, y) pairs share z prefixes. */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = x.cast("long"); val ys = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Hilbert-curve index — better locality than Morton (consecutive
    * indices are always grid-adjacent, no power-of-two jumps), as a
    * native codegen'd expression
    * ([[graft.functions.HilbertIndex2]]). */
  def hilbertValue2(x: Column, y: Column, bits: Int = 16): Column =
    graft.functions.HilbertIndex2.hilbert(x, y, bits)

  /** Curve-ordered parquet write: range-partition on the curve value
    * (sampled range exchange → `files` output files with DISJOINT
    * ranges), sort within each partition, drop the helper column at the
    * sink. Readers prune via ordinary parquet min/max footers on the
    * interleaved columns. `curve` = "morton" | "hilbert". */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
                  files: Int, bits: Int = 16,
                  curve: String = "morton"): Unit = {
    val z = curve match {
      case "morton" => zValue2(col(xCol), col(yCol), bits)
      case "hilbert" => hilbertValue2(col(xCol), col(yCol), bits)
      case other =>
        throw new IllegalArgumentException(s"unknown curve: $other")
    }
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
