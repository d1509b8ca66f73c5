package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics WITHOUT a global sort — the scale-safe form of
  * "row_number() over (Window.orderBy(v)) … filter rk = k" for frames
  * where only the k-th VALUE is needed (exact medians of pair grains:
  * Theil–Sen slopes, Hodges–Lehmann Walsh averages).
  *
  * The window form shuffles the WHOLE frame to one partition and sorts
  * it; at a days²-sized pair grain that is millions of rows through a
  * single task, and at a raw-row grain it is the scale killer the plan
  * gates exist to catch. This selection form never shuffles the input at
  * all — it is two map-side scans plus model-sized aggregation:
  *
  *  1. one groupless aggregate over the frame: `n = count(*)` and a
  *     Greenwald–Khanna rank bracket `[lo, hi]` from
  *     `percentile_approx(v, {q−δ, q+δ}, acc)`. GK's guarantee is a
  *     HARD rank bound (returned value's true rank within ±n/acc of the
  *     requested rank), so for n ≥ [[Selection.bracketMinRows]] the
  *     k-th value provably lies in [lo, hi] whenever
  *     |k − q·n| < (δ − 1/acc)·n — with δ = 5e-3, acc = 1e4 that slack
  *     is 4.9e-3·n ≥ 490 rows, dwarfing the ±1 row of any
  *     "(n+1) div 2"-style k. Below bracketMinRows the bracket is
  *     skipped entirely (lo = hi = null ⇒ band = whole frame), so
  *     small-n exactness never depends on sketch behavior.
  *  2. one pass collapsing rows to DISTINCT values inside the band
  *     (rows below lo fold into a single below-band count, rows above
  *     hi are filtered out), then a groupless collect of the ≤
  *     (2δ + 2/acc)·n-rank-wide band as a sorted (value, count) array
  *     and an `aggregate()` walk to the first value whose running count
  *     reaches k. Ties cost nothing: a band where one value repeats a
  *     million times collapses to ONE array entry.
  *
  * Plan shape under the PlanGuard gates: two groupless aggregates
  * (bounded by construction), one broadcast of a one-row stats frame
  * (the engine's blessed scalar-threading pattern), zero Window
  * operators, zero corpus shuffles. Wrong-bracket bugs cannot be silent:
  * if the walk exhausts the band before reaching k the result column
  * `raise_error`s instead of returning null.
  */
object Selection {

  /** Below this row count the GK bracket is not applied (the whole
    * frame, collapsed to distinct values, is walked instead — exact by
    * construction and still model-sized: ≤ bracketMinRows array
    * entries). */
  val bracketMinRows = 100000L

  /** One-row frame `(n: long, kth: <value type>)` — `n` is the input
    * row count and `kth` the exact k-th smallest `value` (1-based,
    * k = `kOf(n)`), computed by bracketed selection as described above.
    *
    * `q` is the approximate quantile k targets; the caller must pick it
    * so |kOf(n) − q·n| stays within ±490 rows for n ≥
    * [[bracketMinRows]] (any fixed offset like "(n+1) div 2" vs q=0.5
    * qualifies). `kOf` must return a LONG-typed Column.
    *
    * The input is scanned twice (bracket pass + band pass); callers
    * whose frame is generated from a broadcast join of checkpointed
    * grain frames (the pair-grain pattern) pay two map-side
    * regenerations, which at any scale beats one full shuffle to a
    * single partition. */
  def kthValue(df: DataFrame, value: Column, kOf: Column => Column,
               q: Double = 0.5): DataFrame = {
    val delta = 0.005
    val acc = 10000
    val qLo = math.max(0.0, q - delta)
    val qHi = math.min(1.0, q + delta)
    val vt = df.select(value.as("__sel_v")).schema("__sel_v").dataType
    val nullV = lit(null).cast(vt)

    val stats = df.agg(
        count(lit(1)).as("__sel_n"),
        percentile_approx(value, typedlit(Seq(qLo, qHi)), lit(acc))
          .as("__sel_br"))
      .select(col("__sel_n"),
        when(col("__sel_n") >= bracketMinRows,
          element_at(col("__sel_br"), 1)).as("__sel_lo"),
        when(col("__sel_n") >= bracketMinRows,
          element_at(col("__sel_br"), 2)).as("__sel_hi"))

    val bandGroups = df.select(value.as("__sel_v"))
      .crossJoin(broadcast(stats))
      .filter(col("__sel_hi").isNull || col("__sel_v") <= col("__sel_hi"))
      // below-band rows collapse into the null group — only their count
      // matters (they offset k), never their values
      .withColumn("__sel_gv",
        when(col("__sel_lo").isNotNull && col("__sel_v") < col("__sel_lo"),
          nullV).otherwise(col("__sel_v")))
      .groupBy(col("__sel_gv"))
      .agg(count(lit(1)).as("__sel_cnt"), first(col("__sel_n")).as("__sel_n"))

    val accT = struct(lit(0L).as("c"), nullV.as("v"))
    bandGroups.agg(
        coalesce(first(col("__sel_n")), lit(0L)).as("n"),
        coalesce(sum(when(col("__sel_gv").isNull, col("__sel_cnt"))), lit(0L))
          .as("__sel_nb"),
        // collect_list drops the null-group entry (when(...) without
        // otherwise is null there); sort_array orders structs
        // lexicographically, i.e. by value
        sort_array(collect_list(when(col("__sel_gv").isNotNull,
          struct(col("__sel_gv").as("v"), col("__sel_cnt").as("c")))))
          .as("__sel_groups"))
      .withColumn("__sel_k", kOf(col("n")) - col("__sel_nb"))
      .withColumn("__sel_kth", aggregate(
        col("__sel_groups"),
        accT,
        (a, x) => when(a("v").isNotNull, a)
          .when(a("c") + x("c") >= col("__sel_k"),
            struct((a("c") + x("c")).as("c"), x("v").as("v")))
          .otherwise(struct((a("c") + x("c")).as("c"), nullV.as("v"))),
        a => a("v")))
      .select(col("n"),
        when(col("n") === 0, nullV)
          .when(col("__sel_kth").isNotNull, col("__sel_kth"))
          .otherwise(raise_error(concat(
            lit("Selection.kthValue: bracket missed k="),
            kOf(col("n")).cast("string"),
            lit(" of n="), col("n").cast("string"),
            lit(" — GK guarantee violated or kOf outside q±delta"))))
          .cast(vt).as("kth"))
  }

  /** Exact median value: k = (n+1) div 2 of the ascending order — the
    * lower median for even n, matching
    * `row_number().over(orderBy(v)) = (n+1) div 2`. */
  def medianValue(df: DataFrame, value: Column): DataFrame =
    kthValue(df, value, n => floor((n + lit(1L)) / lit(2L)).cast("long"))

  /** Exact `percentile(v, array(probs))` (quantile_cont: linear
    * interpolation at position p·(n−1), Spark's arithmetic bit-for-bit)
    * WITHOUT the exact-percentile aggregate — Spark's `Percentile`
    * builds an OpenHashMap of every distinct value (boxed) per
    * partition, merges them single-threaded and sorts the whole domain:
    * measured 2.7 s warm on one 600k-row double column at sf0.1, and at
    * corpus scale the map IS the column. This form is the multi-probe
    * bracketed selection instead: one stats pass (count + GK brackets
    * around every probe), one below-band counting pass, one band pass
    * collapsing in-band rows to distinct values, then model-sized walks
    * — the 100 TB shape for an EXACT ground-truth quantile.
    *
    * Returns one row per probe: `(pos int, n long, exact double)` with
    * `pos` the 0-based index into `probs` (order preserved via join
    * key) and `n` the non-null row count (percentile semantics: nulls
    * ignored). Empty input yields zero rows.
    *
    * Parity note: interpolation is
    * `(higher − position) · v_lo + (position − lower) · v_hi` with
    * `position = p · (n−1)` in doubles — the exact expression
    * Spark's `Percentile.getPercentile` evaluates, so swapping this
    * into an oracle-gated query cannot change a bit of output
    * (SelectionSpec pins equality against the built-in on random
    * frames). */
  def exactQuantilesCont(df: DataFrame, value: Column,
                         probs: Seq[Double]): DataFrame = {
    val delta = 0.005
    val acc = 10000
    val m = probs.size
    require(m > 0, "exactQuantilesCont: empty probs")
    val v0 = value.cast("double")
    val brs = probs.flatMap(p =>
      Seq(math.max(0.0, p - delta), math.min(1.0, p + delta)))

    // pass 1 — non-null count + one GK sketch answering all 2m bracket
    // quantiles (the sketch is built once; 2m queries against it)
    val stats = df.agg(
        count(v0).as("__sel_n"),
        percentile_approx(v0, typedlit(brs), lit(acc)).as("__sel_br"))
      .select(col("__sel_n"),
        when(col("__sel_n") >= bracketMinRows, col("__sel_br"))
          .as("__sel_br"))

    // pass 2 — below-band counts per probe (zero when unbracketed)
    val nbRow = df.select(v0.as("__sel_v"))
      .filter(col("__sel_v").isNotNull)
      .crossJoin(broadcast(stats))
      .agg(array(probs.indices.map(i =>
        coalesce(sum(when(col("__sel_br").isNotNull &&
          col("__sel_v") < element_at(col("__sel_br"), 2 * i + 1), 1L)
          .otherwise(0L)), lit(0L))): _*).as("__sel_nbs"))

    // pass 3 — rows matched to the probe bands they fall in (usually 0
    // or 1 of them; ALL m when unbracketed), collapsed to distinct
    // values per band
    val bandIdx = filter(
      sequence(lit(0), lit(m - 1)),
      i => col("__sel_br").isNull ||
        (col("__sel_v") >= element_at(col("__sel_br"), i * 2 + 1) &&
         col("__sel_v") <= element_at(col("__sel_br"), i * 2 + 2)))
    val bands = df.select(v0.as("__sel_v"))
      .filter(col("__sel_v").isNotNull)
      .crossJoin(broadcast(stats))
      .select(col("__sel_v"), explode(bandIdx).as("__sel_i"))
      .groupBy(col("__sel_i"), col("__sel_v"))
      .agg(count(lit(1)).as("__sel_cnt"))
      .groupBy(col("__sel_i"))
      .agg(sort_array(collect_list(
        struct(col("__sel_v").as("v"), col("__sel_cnt").as("c"))))
        .as("__sel_groups"))

    // targets: per probe, the two 1-based ranks quantile_cont
    // interpolates between, rebased into the band
    val probsLit = typedlit(probs)
    val targets = stats.crossJoin(broadcast(nbRow))
      .filter(col("__sel_n") > 0)
      .select(col("__sel_n"), col("__sel_nbs"),
        posexplode(probsLit).as(Seq("__sel_i", "__sel_p")))
      .withColumn("__sel_pos",
        col("__sel_p") * (col("__sel_n") - 1).cast("double"))
      .withColumn("__sel_nb",
        element_at(col("__sel_nbs"), col("__sel_i") + 1))
      .withColumn("__sel_klo",
        floor(col("__sel_pos")).cast("long") + 1L - col("__sel_nb"))
      .withColumn("__sel_khi",
        ceil(col("__sel_pos")).cast("long") + 1L - col("__sel_nb"))

    def valueAt(groups: Column, k: Column): Column = {
      val accT = struct(lit(0L).as("c"), lit(null).cast("double").as("v"))
      val walked = aggregate(groups, accT,
        (a, x) => when(a("v").isNotNull, a)
          .when(a("c") + x("c") >= k,
            struct((a("c") + x("c")).as("c"), x("v").as("v")))
          .otherwise(struct((a("c") + x("c")).as("c"),
            lit(null).cast("double").as("v"))),
        a => a("v"))
      when(walked.isNotNull, walked).otherwise(raise_error(lit(
        "Selection.exactQuantilesCont: bracket missed a rank — GK " +
          "guarantee violated")))
    }

    targets.join(bands.withColumnRenamed("__sel_i", "__sel_bi"),
        col("__sel_i") === col("__sel_bi"))
      .drop("__sel_bi")
      .withColumn("__sel_vlo", valueAt(col("__sel_groups"), col("__sel_klo")))
      .withColumn("__sel_vhi",
        when(col("__sel_khi") === col("__sel_klo"), col("__sel_vlo"))
          .otherwise(valueAt(col("__sel_groups"), col("__sel_khi"))))
      .select(col("__sel_i").as("pos"), col("__sel_n").as("n"),
        // Spark Percentile.getPercentile's exact double arithmetic
        when(col("__sel_khi") === col("__sel_klo"), col("__sel_vlo"))
          .otherwise(
            (ceil(col("__sel_pos")).cast("double") - col("__sel_pos")) *
              col("__sel_vlo") +
            (col("__sel_pos") - floor(col("__sel_pos")).cast("double")) *
              col("__sel_vhi")).as("exact"))
  }

  /** GROUPED [[exactQuantilesCont]] (r15; r14 verdict item 6): exact
    * `percentile(v, array(probs))` PER GROUP of `keys`, bit-for-bit
    * Spark's interpolation, without the built-in exact Percentile
    * aggregate — whose per-group OpenHashMap of boxed distinct values
    * is exactly the [[exactQuantilesCont]] scale hazard multiplied by
    * the group count (one value map per group per partition, merged
    * single-threaded). Same three passes as the groupless form, with
    * the one-row stats frame replaced by a group-count-grain stats
    * table broadcast onto the row stream. Group count must be
    * model-sized (it rides a broadcast) — the per-key dashboards this
    * serves (return flags, event types) are low-cardinality by
    * construction.
    *
    * Returns one row per (group, probe): (keys..., pos, n, exact) with
    * `n` the group's non-null count. Groups with zero non-null rows
    * yield no rows (percentile returns null there; callers that need
    * those groups left-join this output). */
  def exactQuantilesContGrouped(df: DataFrame, keys: Seq[String],
                                value: Column,
                                probs: Seq[Double]): DataFrame = {
    val delta = 0.005
    val acc = 10000
    val m = probs.size
    require(m > 0, "exactQuantilesContGrouped: empty probs")
    require(keys.nonEmpty, "exactQuantilesContGrouped: empty keys")
    val v0 = value.cast("double")
    val kc = keys.map(col)
    val brs = probs.flatMap(p =>
      Seq(math.max(0.0, p - delta), math.min(1.0, p + delta)))

    // pass 1 — per-group non-null count + GK brackets
    val stats = df.groupBy(kc: _*).agg(
        count(v0).as("__sel_n"),
        percentile_approx(v0, typedlit(brs), lit(acc)).as("__sel_br0"))
      .select(kc :+ col("__sel_n") :+
        when(col("__sel_n") >= bracketMinRows, col("__sel_br0"))
          .as("__sel_br"): _*)

    val rows = df.select(kc :+ v0.as("__sel_v"): _*)
      .filter(col("__sel_v").isNotNull)
      .join(broadcast(stats), keys)

    // pass 2 — below-band counts per (group, probe)
    val nbRow = rows.groupBy(kc: _*)
      .agg(array(probs.indices.map(i =>
        coalesce(sum(when(col("__sel_br").isNotNull &&
          col("__sel_v") < element_at(col("__sel_br"), 2 * i + 1), 1L)
          .otherwise(0L)), lit(0L))): _*).as("__sel_nbs"))

    // pass 3 — in-band rows per (group, probe), collapsed to distinct
    // values per band
    val bandIdx = filter(
      sequence(lit(0), lit(m - 1)),
      i => col("__sel_br").isNull ||
        (col("__sel_v") >= element_at(col("__sel_br"), i * 2 + 1) &&
         col("__sel_v") <= element_at(col("__sel_br"), i * 2 + 2)))
    val bands = rows
      .select(kc :+ col("__sel_v") :+ explode(bandIdx).as("__sel_i"): _*)
      .groupBy(kc :+ col("__sel_i") :+ col("__sel_v"): _*)
      .agg(count(lit(1)).as("__sel_cnt"))
      .groupBy(kc :+ col("__sel_i"): _*)
      .agg(sort_array(collect_list(
        struct(col("__sel_v").as("v"), col("__sel_cnt").as("c"))))
        .as("__sel_groups"))

    val probsLit = typedlit(probs)
    val targets = stats.join(nbRow, keys)
      .filter(col("__sel_n") > 0)
      .select(kc :+ col("__sel_n") :+ col("__sel_nbs") :+
        posexplode(probsLit).as(Seq("__sel_i", "__sel_p")): _*)
      .withColumn("__sel_pos",
        col("__sel_p") * (col("__sel_n") - 1).cast("double"))
      .withColumn("__sel_nb",
        element_at(col("__sel_nbs"), col("__sel_i") + 1))
      .withColumn("__sel_klo",
        floor(col("__sel_pos")).cast("long") + 1L - col("__sel_nb"))
      .withColumn("__sel_khi",
        ceil(col("__sel_pos")).cast("long") + 1L - col("__sel_nb"))

    def valueAt(groups: Column, k: Column): Column = {
      val accT = struct(lit(0L).as("c"), lit(null).cast("double").as("v"))
      val walked = aggregate(groups, accT,
        (a, x) => when(a("v").isNotNull, a)
          .when(a("c") + x("c") >= k,
            struct((a("c") + x("c")).as("c"), x("v").as("v")))
          .otherwise(struct((a("c") + x("c")).as("c"),
            lit(null).cast("double").as("v"))),
        a => a("v"))
      when(walked.isNotNull, walked).otherwise(raise_error(lit(
        "Selection.exactQuantilesContGrouped: bracket missed a rank — " +
          "GK guarantee violated")))
    }

    targets.join(bands, keys :+ "__sel_i")
      .withColumn("__sel_vlo", valueAt(col("__sel_groups"), col("__sel_klo")))
      .withColumn("__sel_vhi",
        when(col("__sel_khi") === col("__sel_klo"), col("__sel_vlo"))
          .otherwise(valueAt(col("__sel_groups"), col("__sel_khi"))))
      .select(kc :+ col("__sel_i").as("pos") :+ col("__sel_n").as("n") :+
        (when(col("__sel_khi") === col("__sel_klo"), col("__sel_vlo"))
          .otherwise(
            (ceil(col("__sel_pos")).cast("double") - col("__sel_pos")) *
              col("__sel_vlo") +
            (col("__sel_pos") - floor(col("__sel_pos")).cast("double")) *
              col("__sel_vhi"))).as("exact"): _*)
  }
}
