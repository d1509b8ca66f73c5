package graft

/** Driver-contract invariants: every query is oracle-gated and every
  * oracle has a query — a typo in either map would silently downgrade a
  * row to the weaker rows-only check (or orphan an oracle). */
class ContractSpec extends SparkSpec {

  test("queries and oracleSql cover exactly the same names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) === Set.empty[String], "queries without an oracle")
    assert((o -- q) === Set.empty[String], "oracles without a query")
  }

  test("query names follow the qNN_ prefix convention and are unique " +
    "per number") {
    val names = SparkEntry.queries.keySet.toSeq
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), names.sorted)
    val nums = names.map(_.takeWhile(_ != '_'))
    assert(nums.distinct.size === nums.size, "duplicate query numbers")
  }

  test("no nested-loop/cartesian operator in ANY stage of the " +
    "checkpoint-segmented pipelines — including the sub-plans that " +
    "localCheckpoint's lineage truncation hides from the final plan") {
    // the Caches.small users: LSH/candidate pipelines and iterative
    // graph queries, where an accidental cartesian would be the 100 TB
    // killer and the final plan alone can't prove its absence
    val segmented = Seq("q19_dedup_ngram_jaccard", "q20_dedup_minhash_lsh",
      "q23_embedding_neardup", "q70_connected_components",
      "q75_fuzzy_dedup_e2e", "q91_knn_join",
      "q96_cc_star", "q116_bpe_train",
      "q128_triangle_count", "q134_bfs_hops", "q139_weighted_sssp",
      "q160_adamic_adar", "q161_kcore")
    val dir = "/root/testdata/sf0.001"
    for (q <- segmented) {
      graft.ops.Caches.startCapture()
      val finalPlan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      val subPlans = graft.ops.Caches.stopCapture()
      val all = subPlans :+ finalPlan
      assert(all.size >= 2, s"$q: expected checkpointed sub-plans")
      for ((p, i) <- all.zipWithIndex) {
        val nl = p.linesIterator.count(l =>
          l.contains("BroadcastNestedLoop") || l.contains("CartesianProduct"))
        assert(nl === 0, s"$q sub-plan $i/${all.size} has a nested loop")
      }
    }
  }

  // Global (partition-less) Windows whose input is NOT provably bounded
  // from the plan alone: each entry documents why that input cannot
  // grow past metadata size — a calendar-bounded grain (days/weeks of a
  // fixed corpus window), a fixed small dimension, a Zipf-capped vocab
  // slice, or (for the raw-row cases) an explicit map-side prune that
  // leaves only a frontier-sized sliver. A query NOT in this map must
  // prove its global-window input bounded from the plan (group-limit-
  // capped rank, one-row aggregates, limits, partition-id offsets) or
  // run the two-phase Dedup.numberRows/numberAndRunningSum form.
  private val globalWindowGrains: Map[String, String] = Map(
    "q126_pareto" -> "nation grain (25 rows)",
    "q140_cumulative_users" -> "calendar-day grain (first-seen-day pre-agg)",
    "q147_hierarchy_rollup" -> "nation grain (25 rows)",
    "q172_skyline" -> "decile-dominance pruned sliver (frontier-sized) + 10-row decile-max table",
    "q175_acf" -> "calendar-day grain",
    "q183_good_turing" -> "frequency-of-frequencies grain (≤ max count, Zipf)",
    "q184_bootstrap" -> "48 bootstrap-replicate grain",
    "q189_zipf_fit" -> "vocab rank grain, consumed under a ≤50k rank filter",
    "q205_kaplan_meier" -> "event-day grain (calendar-bounded)",
    "q211_theil_sen" -> "calendar-day-PAIR grain (bounded by days²)",
    "q215_lead_lag" -> "calendar-day grain",
    "q224_ab_fdr" -> "market-segment grain (5 rows)",
    "q226_hodges_lehmann" -> "calendar-day-pair grain (bounded by days²)",
    "q240_error_budget" -> "calendar-day grain",
    "q243_water_filling" -> "source-dimension grain (documents.source)",
    "q251_decomposition" -> "calendar-day grain",
    "q261_quota_spillover" -> "spill candidates capped map-side at rank ≤ quota+budget per segment",
    "q265_pareto_layers" -> "decile-dominance pruned sliver per front (q172 pattern)",
    "q268_ucb_priority" -> "source-dimension grain",
    "q269_info_gain" -> "feature grain (fixed feature list)")

  test("every global (partition-less) Window — in any query's plan, " +
    "including checkpoint-hidden sub-plans — is provably bounded, or " +
    "carries a documented metadata-sized-input justification (the " +
    "q172/q238 two-phase rule, machine-checked)") {
    val dir = "/root/testdata/sf0.001"
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((q, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      graft.ops.Caches.startCapture()
      val finalPlan = fn(spark, dir).queryExecution.executedPlan
      val subs = graft.ops.Caches.stopCapturePlans()
      for (p <- subs :+ finalPlan;
           w <- graft.plans.PlanGuard.globalWindows(p)) {
        if (graft.plans.PlanGuard.bounded(w.child) ||
            globalWindowGrains.contains(q)) ()
        else if (graft.plans.PlanGuard.grainReduced(w.child))
          bad += s"$q: global Window over an undocumented aggregate grain"
        else bad += s"$q: global Window over RAW (non-aggregated) rows"
      }
    }
    assert(bad.isEmpty, "\n" + bad.distinct.mkString("\n"))
  }

  // BroadcastNestedLoopJoins whose build side the plan cannot PROVE
  // bounded: each entry says why the broadcast frame is model-sized (or
  // names the knob that keeps it so at scale). A CartesianProduct is
  // never excusable; an undocumented unbounded-build BNLJ fails.
  private val bnljBuilds: Map[String, String] = Map(
    "q176_kmv_intersection" -> "two KMV bottom-64 sketch artifacts (k-capped)",
    "q180_chisq" -> "row/col margin tables (event-type × decile grains)",
    "q185_geo_hubs" -> "25 broadcast hubs (nation-derived)",
    "q211_theil_sen" -> "calendar-day grain pair build (days² metadata-sized)",
    "q225_mann_kendall" -> "calendar-day grain pair build",
    "q226_hodges_lehmann" -> "calendar-day grain pair build",
    "q22_cosine_topk" -> "single query vector (vec_id = 0 equality filter)",
    "q232_ann_recall" -> "fixed probe set (key-equality filter)",
    "q244_hard_negatives" -> "anchor sample — 1/101 rate is the scale knob; cap anchors or switch to the q23 LSH-blocked path at corpus scale",
    "q246_knn_label_purity" -> "probe sample — same rate knob as q244",
    "q24_ann_ivf" -> "IVF centroid table (k-means model-sized)",
    "q92_semantic_dedup" -> "cluster-centroid model frame")

  test("no scale-killer join shape in ANY query's physical plan " +
    "(object-level: CartesianProduct anywhere, or an UNDOCUMENTED " +
    "BroadcastNestedLoopJoin whose build side is not provably bounded) " +
    "— including the sub-plans that localCheckpoint hides") {
    val dir = "/root/testdata/sf0.001"
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((q, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      graft.ops.Caches.startCapture()
      val finalPlan = fn(spark, dir).queryExecution.executedPlan
      val subs = graft.ops.Caches.stopCapturePlans()
      for (p <- subs :+ finalPlan;
           k <- graft.plans.PlanGuard.killers(p)) {
        if (k.startsWith("BroadcastNestedLoopJoin") && bnljBuilds.contains(q)) ()
        else bad += s"$q: $k"
      }
    }
    assert(bad.isEmpty, "\n" + bad.distinct.mkString("\n"))
  }

  test("no non-broadcast CartesianProduct in the round-5 family's " +
    "physical plans (broadcast single-row/model-sized cross joins are " +
    "the intended pattern; a CartesianProduct operator means both " +
    "sides shuffled — the 100 TB killer)") {
    val dir = "/root/testdata/sf0.001"
    val family = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => n.take(4).drop(1).toIntOption.exists(_ >= 171))
    assert(family.size >= 35, family.mkString(","))
    for (q <- family) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      val cp = plan.linesIterator.count(_.contains("CartesianProduct"))
      assert(cp === 0, s"$q plan has a CartesianProduct")
    }
  }
}
