package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomExpressions

/** Join-side reduction operators — the hand-rollable form of runtime
  * row-level filtering for when the optimizer's own trigger conditions
  * (creation-side size thresholds, shuffle-stage shapes) don't fire.
  *
  * Scale story (100 TB): a selective dimension (say 0.1% of customers)
  * joined to a fact table normally shuffles EVERY fact row; the join
  * itself is what discards 99.9% of them, after they've been hashed,
  * serialized and sent over the network. Building a bloom filter over
  * the dimension keys (one map-side-combined aggregation over the small
  * side) and probing it in the fact SCAN deletes that traffic before
  * the exchange — the same plan shape Spark's
  * `spark.sql.optimizer.runtime.bloomFilter` injects, but available
  * deterministically as an operator.
  */
object JoinOps {

  /** Rows of `fact` whose `factKey` might be in `dim`'s `dimKey` set.
    * Exactness contract: NO false negatives (bloom guarantee), so
    * `semiPruned(...).join(dim, ...)` ≡ `fact.join(dim, ...)` — false
    * positives are dropped by the real join. The bloom is built driver-
    * side from one aggregation over the DIMENSION (model-sized: ~1.2 MB
    * per million keys at 1% FPP) and ships with the plan; the probe is
    * a codegen'd two-hash check inside the fact scan stage. */
  def semiPruned(fact: DataFrame, factKey: String,
                 dim: DataFrame, dimKey: String,
                 fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(col(dimKey).cast("long")).na.drop()
    val n = math.max(keys.count(), 64L)
    val bloom = keys.stat.bloomFilter(dimKey, n, fpp)
    fact.filter(BloomExpressions.mightContain(col(factKey), bloom))
  }

  /** Bloom-pruned inner equi-join: prune the fact side first, then join
    * — result is EXACTLY `fact.join(dim, factKey === dimKey)`, with the
    * fact-side shuffle carrying only might-match rows. */
  def bloomPrunedJoin(fact: DataFrame, factKey: String,
                      dim: DataFrame, dimKey: String,
                      fpp: Double = 0.01): DataFrame =
    semiPruned(fact, factKey, dim, dimKey, fpp)
      .join(dim, col(factKey) === col(dimKey))
}
