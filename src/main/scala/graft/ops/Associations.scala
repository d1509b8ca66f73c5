package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — pairwise frequent-itemset rules
  * (support / confidence / lift), the co-occurrence analysis layer a
  * recommender or assortment pipeline runs over transaction data.
  *
  * Scale (100 TB of baskets): the classic FP-growth driver loop is
  * replaced by the RELATIONAL pair form — a self-join of the distinct
  * (basket, item) frame on the basket key. That join's fan-out is
  * per-basket quadratic but baskets are order-sized (tens of items,
  * bounded by business reality, like q130's ~7-line orders), so the
  * candidate count is Σ|b|² ≈ O(rows · avg_basket) — linear in the
  * data, shuffled once on the basket key. Item marginals are a
  * vocabulary-sized frame joined back by key equality (AQE broadcasts
  * them when small). No driver-side itemset lattice, no collect.
  *
  * A `minPairCount` prefilter keeps the rule table itself sparse — the
  * same df-cut idea the n-gram dedup family uses for stop-shingles.
  */
object Associations {

  /** Directed pairwise rules `a → b` over distinct basket membership:
    * `support = P(a,b)`, `confidence = P(b|a)`, `lift =
    * P(a,b)/(P(a)P(b))`. Returns both directions of every qualifying
    * unordered pair with raw counts alongside the ratios, unrounded
    * (callers round for gating). */
  def rules(baskets: DataFrame, basket: String, item: String,
            minPairCount: Long = 1L): DataFrame = {
    val membership = baskets
      .select(col(basket).as("__b"), col(item).as("__i")).distinct()
    val nBaskets = membership.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__n"))
    val itemN = membership.groupBy(col("__i"))
      .agg(count(lit(1)).as("__ic"))
    // unordered pair counts (a < b), then mirrored into both directions
    val lhs = membership.select(col("__b"), col("__i").as("item_a"))
    val rhs = membership.select(col("__b"), col("__i").as("item_b"))
    val pairs = lhs.join(rhs, Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minPairCount)
    val directed = pairs.unionByName(
      pairs.select(col("item_b").as("item_a"), col("item_a").as("item_b"),
        col("pair_n")))
    directed
      .join(itemN.select(col("__i").as("item_a"), col("__ic").as("a_n")),
        "item_a")
      .join(itemN.select(col("__i").as("item_b"), col("__ic").as("b_n")),
        "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("pair_n"),
        col("a_n"), col("b_n"),
        (col("pair_n").cast("double") / col("__n")).as("support"),
        (col("pair_n").cast("double") / col("a_n")).as("confidence"),
        (col("pair_n").cast("double") * col("__n") /
          (col("a_n") * col("b_n"))).as("lift"))
  }
}
