package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style declarative data-quality auditing: a rule set evaluates to
  * one long-form report `(check, value, passed)`.
  *
  * Scale design (100 TB): every same-table metric rides ONE aggregation
  * over ONE scan (map-side partial aggregation; no per-rule pass), so
  * adding a rule is free; referential checks are anti joins, which AQE
  * turns into broadcast probes when the dimension side is small. The
  * report is rows, not driver state — it lands in the warehouse like any
  * other table and diffs across runs with [[graft.engine.Merge.snapshotDiff]].
  */
object Audit {

  /** Run `metrics` (name → aggregate expression) in a single aggregation
    * over `df`, then evaluate each rule (name → predicate over the
    * metric's value column) engine-side. Metrics must be castable to
    * long (counts). */
  def singlePass(df: DataFrame, metrics: Seq[(String, Column)],
                 rules: Map[String, Column => Column]): DataFrame = {
    require(metrics.nonEmpty)
    val row = df.agg(metrics.head._2.as(metrics.head._1),
      metrics.tail.map { case (n, c) => c.as(n) }: _*)
    val stacked = metrics.map { case (n, _) =>
      struct(lit(n).as("check"), col(n).cast("long").as("value"),
        rules(n)(col(n)).cast("long").as("passed"))
    }
    row.select(explode(array(stacked: _*)).as("s")).select("s.*")
  }

  /** Referential-integrity check as a rule row: rows of `fact` whose
    * `fk` has no match in `dim.pk` (anti join — broadcast under AQE
    * when `dim` is small). Passed iff the orphan count is zero. */
  def referential(name: String, fact: DataFrame, fk: String,
                  dim: DataFrame, pk: String): DataFrame =
    fact.select(col(fk))
      .join(dim.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("value"))
      .select(lit(name).as("check"), col("value").cast("long").as("value"),
        (col("value") === 0).cast("long").as("passed"))
}
