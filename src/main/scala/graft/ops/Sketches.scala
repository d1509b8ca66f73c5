package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SortedSumD.{sortedSum => ssum}

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
  *
  * The heavy-hitter pipeline below is the other sketch family a corpus
  * pipeline needs: find frequent keys in 100 TB WITHOUT shuffling the
  * full key universe. Pass 1 runs a Misra–Gries summary independently
  * inside each partition (map-side only, O(capacity) memory, zero
  * shuffle) and unions the surviving candidate keys; pass 2 recounts
  * ONLY the candidates exactly (a broadcast semi-join prunes the corpus
  * before the shuffle, so the aggregation shuffles candidate keys only).
  *
  * Guarantee (what makes the pruning SOUND, not heuristic): Misra–Gries
  * with capacity k undercounts any key by at most n_p/k within a
  * partition of n_p rows, so a key absent from EVERY partition's summary
  * has global frequency <= Σ n_p/k = n/k. Choosing capacity >=
  * 1/minFraction means no key at or above the caller's threshold can be
  * missed; the exact recount removes all false positives. The final
  * counts are EXACT — the sketch only decides where counting happens
  * (reference analogue: frequency filters over corpus n-grams; cf.
  * exo_2.py's full-table value counts, which at 100 TB would shuffle
  * every distinct key).
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

  /** Per-group KMV distinct-count: the same bottom-k estimator as
    * [[kmvDistinct]], one sketch per group — distinct-users-per-segment
    * style profiling in a single pass. The rank<=k cut is a keyed
    * window, so Spark's WindowGroupLimit pushes the per-group bottom-k
    * below the shuffle (k rows per partition·group move, not the
    * distinct-hash universe); the estimate is exact whenever a group
    * has fewer than k distinct hashes. */
  def kmvDistinctGrouped(df: DataFrame, groupCols: Seq[String], e: Column,
                         k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val hashed = df.select((g :+ TextFunctions.md5Hash48(e).as("h")): _*)
      .distinct()
    val w = Window.partitionBy(g: _*).orderBy(col("h"))
    hashed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"), max(col("h")).as("hk"))
      .select((g :+
        when(col("n") < k, col("n").cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble) * lit(HashSpace) / col("hk"), 4))
          .as("est_distinct") :+
        col("n").cast("long").as("k_used")): _*)
  }

  /** Pass 1: per-partition Misra–Gries candidate keys (as strings).
    * Any key with global frequency > n/capacity survives in at least
    * one partition's summary. Amortized O(1) per row: each decrement
    * round removes `capacity` total counts, so rounds <= n/capacity. */
  def heavyHitterCandidates(df: DataFrame, key: String,
                            capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(key).cast("string")).as[String]
    keys.mapPartitions { it =>
      val counters = new java.util.HashMap[String, Long](capacity * 2)
      it.foreach { k =>
        val cur = counters.getOrDefault(k, 0L)
        if (cur > 0L) counters.put(k, cur + 1L)
        else if (counters.size < capacity) counters.put(k, 1L)
        else {
          val itr = counters.entrySet().iterator()
          while (itr.hasNext) {
            val e = itr.next()
            if (e.getValue == 1L) itr.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      counters.keySet().iterator().asScala
    }.toDF(key).distinct()
  }

  /** Two-pass exact heavy hitters: Misra–Gries candidates, then an
    * exact recount of candidates only. Returns `(key, cnt)` for every
    * candidate; callers apply their frequency threshold on `cnt` (any
    * threshold >= n/capacity is guaranteed complete). */
  def heavyHitters(df: DataFrame, key: String, capacity: Int): DataFrame = {
    val cand = heavyHitterCandidates(df, key, capacity)
    df.select(col(key).cast("string").as(key))
      .join(broadcast(cand), Seq(key), "left_semi")
      .groupBy(key)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Count-Min sketch build: a depth × width grid of EXACT counters —
    * cell (d, b) counts the rows whose d-th hash lands in bucket b
    * (independent hash functions = md5Hash48 seeded with the row index
    * d, the same replayable family every sketch here uses).
    *
    * Scale shape: the map side explodes each row into `depth` cells and
    * partially aggregates, so the shuffle carries at most
    * partitions × depth × width partial cells — FIXED-size state
    * regardless of corpus size or key cardinality, and two sketches
    * merge by adding cells (the partial-agg combine IS the sketch
    * merge). This is the frequency sketch for the regime where even the
    * heavy-hitter candidate pass is too much state: depth·width counters
    * stand in for the full key universe, at the price of overestimation
    * (bucket collisions only inflate counts, never deflate — the
    * classic CM one-sided error). */
  def countMin(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch shape ${depth}x$width")
    val cells = df.select(explode(array((0 until depth).map(d =>
      struct(lit(d).as("d"),
        pmod(TextFunctions.md5Hash48(key, d), lit(width.toLong)).as("bucket"))): _*))
      .as("c"))
    cells.groupBy(col("c.d").as("d"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[countMin]] over a PRE-AGGREGATED (key, weight) frame: cell
    * (d, b) sums `weight` over the keys whose d-th hash lands in b —
    * integer-identical to [[countMin]] over the raw rows when `weight`
    * is each key's row count, because CM cells are plain sums and
    * summation is associative over the per-key grouping. Lets one
    * key-grain aggregation feed SEVERAL sketches (and an exact
    * key-frequency computation) from a single corpus scan, instead of
    * each sketch re-scanning the raw rows (r15, q311: 4 lineitem
    * scans → 1). */
  def countMinWeighted(df: DataFrame, key: Column, weight: Column,
                       depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch shape ${depth}x$width")
    val cells = df.select(explode(array((0 until depth).map(d =>
      struct(lit(d).as("d"),
        pmod(TextFunctions.md5Hash48(key, d), lit(width.toLong)).as("bucket"))): _*))
      .as("c"), weight.as("__w"))
    cells.groupBy(col("c.d").as("d"), col("c.bucket").as("bucket"))
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Count-Min point lookup: estimate of each probe key's frequency =
    * min over the depth rows of its bucket counters (missing cell = 0).
    * Estimates are exact upper bounds: est >= true count always, and
    * P[est > true + εn] <= δ at depth = ln(1/δ), width = e/ε. The probe
    * set is tiny (it is a lookup, not a scan), so the join broadcasts. */
  def countMinLookup(sketch: DataFrame, probes: DataFrame, key: String,
                     depth: Int, width: Int): DataFrame = {
    val pb = probes.select(col(key)).distinct()
      .select(col(key), explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"),
          pmod(TextFunctions.md5Hash48(col(key), d), lit(width.toLong))
            .as("bucket"))): _*)).as("c"))
      .select(col(key), col("c.d").as("d"), col("c.bucket").as("bucket"))
    broadcast(pb).join(sketch, Seq("d", "bucket"), "left")
      .groupBy(col(key))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** HyperLogLog-style distinct count from the 48-bit md5 hash:
    * bucket = low p bits, rank = leading-zero count of the remaining
    * (48−p)-bit word + 1, register = max rank per bucket, raw estimate
    * alpha·m²/Σ2^−M with the standard linear-counting fallback when the
    * raw estimate is small and empty registers remain (Flajolet et al.'s
    * two estimator regimes — both are exercised across the test SFs).
    *
    * Where KMV ([[kmvDistinct]]) keeps k hash VALUES, HLL keeps m
    * 6-bit-ish register MAXES — the fixed-m register file is the
    * cheapest mergeable cardinality state (merge = element-wise max),
    * which is why it is the sketch to ship per-partition at 100 TB: the
    * groupBy(bucket).max(rank) below IS that merge, with ≤ partitions·m
    * partial registers ever shuffling. Every step is integer/dyadic
    * arithmetic (2^−M is exact in a double; the Σ folds in sorted
    * order), so the whole estimator is DuckDB-replayable bit-for-bit.
    * Returns one row: (est_distinct, nonzero_buckets). */
  def hllEstimate(df: DataFrame, e: Column, p: Int = 6): DataFrame = {
    require(p >= 2 && p <= 16, s"bad precision $p")
    val m = 1 << p
    val remBits = 48 - p
    val h = TextFunctions.md5Hash48(e)
    val bucket = pmod(h, lit(m.toLong))
    val r = shiftright(h, p)
    val rank = when(r === 0, lit(remBits + 1))
      .otherwise(lit(remBits + 1) - length(bin(r)))
    val registers = df.select(bucket.as("bucket"), rank.as("rank"))
      .groupBy("bucket").agg(max(col("rank")).as("mx"))
    // alpha_m for m >= 64 (the standard constant, written as the same
    // double expression the oracle uses)
    val alpha =
      if (m >= 128) lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
      else if (m == 64) lit(0.709)
      else lit(0.697)
    registers
      .agg(count(lit(1)).as("nz"),
        ssum(collect_list(
          pow(lit(2.0), -col("mx").cast("double")))).as("s"))
      .select(col("nz"),
        (col("s") + (lit(m.toDouble) - col("nz"))).as("st"),
        (lit(m.toLong) - col("nz")).as("v"))
      .select(col("nz"),
        (alpha * lit(m.toDouble) * lit(m.toDouble) / col("st")).as("eraw"),
        col("v"))
      .select(
        round(when(col("eraw") <= lit(2.5 * m) && col("v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(col("eraw")), 4).as("est_distinct"),
        col("nz").as("nonzero_buckets"))
  }

  /** KMV set-similarity: estimate the JACCARD of two sets from their
    * bottom-k sketches alone (Beyer et al.) — the union's bottom-k is
    * a uniform sample of the union, so the fraction of it present in
    * BOTH sketches estimates |A∩B|/|A∪B|. Exact values ride along for
    * the error contrast. Returns one row:
    * (sketch_k, union_sketch_size, in_both, j_est, exact_inter,
    * exact_union, j_exact).
    *
    * Scale (100 TB): each sketch is a TakeOrdered over distinct hashes
    * (map-side partial bottom-k, one merge); the similarity of two
    * corpus-scale sets is then decided by joining two k-row artifacts —
    * the sets themselves never meet in a join. Deterministic md5
    * hashing, so any engine replays the estimate bit-for-bit. */
  def kmvJaccard(a: DataFrame, b: DataFrame, e: String,
                 k: Int = 64): DataFrame = {
    def sk(df: DataFrame) = Caches.small(
      df.select(TextFunctions.md5Hash48(col(e).cast("string")).as("h"))
        .distinct().orderBy(col("h")).limit(k))
    val ka = sk(a)
    val kb = sk(b)
    val union = ka.unionByName(kb).distinct().orderBy(col("h")).limit(k)
    val flags = union
      .join(ka.withColumn("ina", lit(1)), Seq("h"), "left")
      .join(kb.withColumn("inb", lit(1)), Seq("h"), "left")
      .agg(count(lit(1)).as("union_sketch_size"),
        sum((col("ina").isNotNull && col("inb").isNotNull).cast("long"))
          .as("in_both"))
    val exact = a.select(col(e).cast("string").as("x")).distinct()
      .withColumn("ina", lit(1))
      .join(b.select(col(e).cast("string").as("x")).distinct()
        .withColumn("inb", lit(1)), Seq("x"), "full_outer")
      .agg(sum((col("ina").isNotNull && col("inb").isNotNull).cast("long"))
          .as("exact_inter"),
        count(lit(1)).as("exact_union"))
    flags.crossJoin(broadcast(exact))
      .select(lit(k).as("sketch_k"), col("union_sketch_size"),
        col("in_both"),
        round(col("in_both").cast("double") /
          col("union_sketch_size").cast("double"), 4).as("j_est"),
        col("exact_inter"), col("exact_union"),
        round(col("exact_inter").cast("double") /
          col("exact_union").cast("double"), 4).as("j_exact"))
  }

  /** Per-group HLL REGISTERS `(grp, bucket, mx)` — the mergeable sketch
    * state itself, not an estimate. This is the property that makes HLL
    * the warehouse cardinality sketch: registers from disjoint
    * partitions/sources/days union by `max` per bucket with NO loss, so
    * a 100 TB corpus is sketched source-by-source (m·groups tiny rows)
    * and any roll-up is a groupBy-max over register rows — never a
    * rescan. */
  def hllRegistersBy(df: DataFrame, grp: Column, e: Column,
                     p: Int = 6): DataFrame = {
    require(p >= 2 && p <= 16, s"bad precision $p")
    val m = 1 << p
    val remBits = 48 - p
    val h = TextFunctions.md5Hash48(e)
    val bucket = pmod(h, lit(m.toLong))
    val r = shiftright(h, p)
    val rank = when(r === 0, lit(remBits + 1))
      .otherwise(lit(remBits + 1) - length(bin(r)))
    df.select(grp.as("grp"), bucket.as("bucket"), rank.as("rank"))
      .groupBy("grp", "bucket").agg(max(col("rank")).as("mx"))
  }

  /** Standard-HLL estimate from register rows, per value of the `keys`
    * columns (empty = one global row). Identical arithmetic to
    * [[hllEstimate]] (sorted-fold register sum, linear counting below
    * 2.5·m) so merged-register estimates replay in any engine. */
  def hllEstimateFromRegisters(regs: DataFrame, keys: Seq[String],
                               p: Int): DataFrame = {
    val m = 1 << p
    val alpha =
      if (m >= 128) lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
      else if (m == 64) lit(0.709)
      else lit(0.697)
    regs
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("nz"),
        ssum(collect_list(
          pow(lit(2.0), -col("mx").cast("double")))).as("s"))
      .select(keys.map(col) ++ Seq(col("nz"),
        (col("s") + (lit(m.toDouble) - col("nz"))).as("st"),
        (lit(m.toLong) - col("nz")).as("v")): _*)
      .select(keys.map(col) ++ Seq(col("nz"),
        (alpha * lit(m.toDouble) * lit(m.toDouble) / col("st")).as("eraw"),
        col("v")): _*)
      .select(keys.map(col) ++ Seq(
        round(when(col("eraw") <= lit(2.5 * m) && col("v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(col("eraw")), 4).as("est_distinct"),
        col("nz").as("nonzero_buckets")): _*)
  }
}
