package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable non-equi interval joins. Spark plans a bare
  * `point BETWEEN start AND end` predicate as a nested-loop/cartesian
  * join — O(|points|·|intervals|) work and a broadcast of one whole
  * side. The classic scale-safe rewrite is BUCKETIZATION: quantize time
  * into fixed-width buckets, explode each interval into the buckets it
  * overlaps, tag each point with its single containing bucket, equi-join
  * on the bucket key, then apply the exact range predicate to the
  * (bucket-local) candidates.
  *
  * Scale (100 TB): the join becomes a plain shuffle join keyed on the
  * bucket — Spark parallelizes it like any aggregation. Work is
  * O(points + intervals·span/bucket + candidates); candidates per point
  * = intervals overlapping its bucket, which is the data's real
  * density, not the corpus size. Each (point, interval) candidate
  * arises EXACTLY once (a point has one bucket), so no dedup pass is
  * needed. Pick the bucket width near the median interval span: wider
  * buckets = fewer interval replicas but more false candidates; the
  * exact filter keeps the result identical either way.
  */
object RangeJoin {

  /** Inner join of `points` to every interval with
    * `start <= point < end` (end exclusive), via bucketed equi-join.
    * `bucket` is a `date_trunc` unit (`day`, `hour`, …). Rows with a
    * null point/start/end never match (bucket key or predicate is
    * null), matching SQL join semantics. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucket: String = "day"): DataFrame = {
    val ib = intervals.withColumn("__b",
      explode(sequence(date_trunc(bucket, col(startCol)),
        date_trunc(bucket, col(endCol)),
        expr(s"interval 1 $bucket"))))
    val pb = points.withColumn("__b", date_trunc(bucket, col(pointCol)))
    pb.join(ib, Seq("__b"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__b")
  }
}
