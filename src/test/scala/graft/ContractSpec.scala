package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every query is oracle-gated and every
  * oracle has a query — a typo in either map would silently downgrade a
  * row to the weaker rows-only check (or orphan an oracle). */
class ContractSpec extends AnyFunSuite {

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
}
