package graft

import org.apache.spark.sql.functions._

import graft.ops.JoinOps

/** Bloom-pruned join: exactness vs the plain join, and the plan contract
  * — the probe is a native codegen'd filter below the join, so pruning
  * happens before the fact side reaches any exchange. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bloomPrunedJoin equals the plain join exactly (no false negatives)") {
    val fact = (1 to 5000).map(i => (i.toLong % 997, s"f$i")).toDF("fk", "v")
    val dim = (0L until 50L).map(k => (k * 7, s"d$k")).toDF("dk", "d")
    val plain = fact.join(dim, $"fk" === $"dk")
    val pruned = JoinOps.bloomPrunedJoin(fact, "fk", dim, "dk")
    assert(pruned.orderBy("fk", "v").collect().toSeq ===
      plain.orderBy("fk", "v").collect().toSeq)
  }

  test("the probe plans as a native bloom_might_contain filter and prunes " +
    "the fact side before the join") {
    // a REAL scan (parquet), not a LocalRelation — Catalyst folds filters
    // over local relations away at optimize time, hiding the probe
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    (1 to 5000).map(i => (i.toLong, s"f$i")).toDF("fk", "v")
      .write.mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = Seq((1L, "a"), (2L, "b")).toDF("dk", "d")
    val pruned = JoinOps.semiPruned(fact, "fk", dim, "dk")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"))
    val n = pruned.count()
    // both true keys survive (no false negatives); the bulk is pruned
    // (fpp 1% on 5k rows leaves ~50 false positives, far below 5000)
    assert(n >= 2 && n < 1000, s"expected heavy pruning, kept $n rows")
  }

  test("null and int-typed fact keys: nulls never match; int keys are " +
    "cast to the bloom's long key space") {
    val fact = Seq(Some(1), Some(3), None).map(k => (k, "x"))
      .toDF("fk", "v")
    val dim = Seq((1L, "a")).toDF("dk", "d")
    val got = JoinOps.bloomPrunedJoin(fact, "fk", dim, "dk")
      .select("fk").as[Int].collect().toSeq
    assert(got === Seq(1))
  }
}
