package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.TextFunctions

/** Deterministic, mergeable sketches for corpus-scale statistics.
  *
  * KMV (K Minimum Values) distinct-count: hash every element with the
  * engine's md5-derived 48-bit hash, keep the k smallest DISTINCT hash
  * values, and estimate |D| ≈ (k−1) · 2^48 / h_k (Bar-Yossef et al.'s
  * classic bottom-k estimator). Two properties make it the right sketch
  * here rather than an opaque HLL register file:
  *  - every step is exact md5/integer work that any engine reproduces
  *    bit-for-bit, so the whole sketch is DuckDB-oracle-gated like the
  *    rest of the engine (hash collisions at 48 bits are part of the
  *    spec on both sides);
  *  - it is trivially mergeable: union the bottom-k sets and re-take
  *    the bottom k. Spark's TakeOrdered does exactly that shape —
  *    per-partition partial bottom-k, then a final merge — so the
  *    distributed plan IS the sketch merge, with k·partitions rows ever
  *    crossing the wire.
  */
object Sketches {

  /** 2^48 — the md5Hash48 hash space size. */
  val HashSpace: Double = 281474976710656.0

  /** One-row distinct-count estimate of `expr` over `df`:
    * (est_distinct, k_used). Exact (= the observed distinct-hash count)
    * whenever fewer than k distinct hashes exist; the bottom-k estimate
    * otherwise. */
  def kmvDistinct(df: DataFrame, e: Column, k: Int): DataFrame = {
    val bottomK = df.select(TextFunctions.md5Hash48(e).as("h"))
      .distinct()
      .orderBy(col("h"))
      .limit(k) // TakeOrdered: partial bottom-k map-side, merged once
    bottomK.agg(count(lit(1)).as("n"), max(col("h")).as("hk"))
      .select(
        when(col("n") < k, col("n").cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble) * lit(HashSpace) / col("hk"), 4))
          .as("est_distinct"),
        col("n").cast("long").as("k_used"))
  }
}
