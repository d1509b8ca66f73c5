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
