package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.TextFunctions

/** Merkle-style table integrity: key-range bucket checksums and the
  * bucket-level diff of two snapshots — the anti-entropy primitive that
  * makes CDC affordable at warehouse scale. Comparing two 100 TB
  * replicas row-by-row ([[graft.engine.Merge.snapshotDiff]]) shuffles
  * both tables; comparing their bucket checksums ships ONE ROW PER KEY
  * RANGE across the wire, and only the buckets whose checksums disagree
  * go to the row-level diff — the Cassandra/Dynamo repair pattern
  * expressed relationally.
  *
  * Checksum contract: per-row 48-bit md5 over a caller-built canonical
  * string, folded per bucket with `bit_xor` — order-independent (so any
  * partitioning yields the same checksum) and engine-reproducible (the
  * md5-hex-prefix idiom every oracle replays). XOR cancels IDENTICAL
  * duplicate rows pairwise, so tables whose rows are unique per key
  * (the keyed-snapshot case) compare soundly; `cnt` rides along to
  * catch the even-multiplicity edge.
  */
object Integrity {

  /** One checksum row per key-range bucket: `(bucket, cnt, checksum)`.
    * `row` must be a deterministic canonical encoding of the columns
    * under comparison (e.g. `concat_ws('|', key, cols…)`).
    *
    * The bucket id is INTEGER division (`div`), not `floor(key/width)`:
    * double division silently loses precision for keys above 2^53
    * (ns-epoch longs live there), and `div`'s truncation-toward-zero
    * matches the oracle engines' integer `//` on negative keys where
    * floor-of-double would disagree. */
  def bucketChecksums(df: DataFrame, key: Column, row: Column,
                      bucketWidth: Long): DataFrame =
    df.select(key.cast("long").as("__gk"),
        TextFunctions.md5Hash48(row).as("__h"))
      .select(expr(s"__gk div ${bucketWidth}L").as("bucket"), col("__h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"), bit_xor(col("__h")).as("checksum"))

  /** Bucket-level diff of two snapshots: full-outer join of their
    * checksum tables, classifying each bucket `match` / `differ` /
    * `old_only` / `new_only`. Feed the non-matching buckets' key
    * ranges to a partition-pruned row diff. */
  def merkleDiff(oldSnap: DataFrame, newSnap: DataFrame, key: Column,
                 row: Column, bucketWidth: Long): DataFrame = {
    val o = bucketChecksums(oldSnap, key, row, bucketWidth)
      .select(col("bucket"), col("cnt").as("old_cnt"),
        col("checksum").as("old_sum"))
    val n = bucketChecksums(newSnap, key, row, bucketWidth)
      .select(col("bucket"), col("cnt").as("new_cnt"),
        col("checksum").as("new_sum"))
    o.join(n, Seq("bucket"), "full_outer")
      .select(col("bucket"), col("old_cnt"), col("new_cnt"),
        when(col("old_cnt").isNull, "new_only")
          .when(col("new_cnt").isNull, "old_only")
          .when(col("old_sum") === col("new_sum") &&
            col("old_cnt") === col("new_cnt"), "match")
          .otherwise("differ").as("status"))
  }
}
