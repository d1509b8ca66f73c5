package graft.ops

import org.apache.spark.sql.DataFrame

/** Cache-lifecycle helpers for multi-stage ops (LSH candidate pipelines)
  * that persist intermediate frames consumed by several downstream joins.
  */
private[graft] object Caches {

  /** Sub-plan capture for PlanAudit/ContractSpec: a localCheckpoint
    * TRUNCATES lineage, so the final plan of an LSH pipeline shows only
    * the post-materialization tail — the expensive candidate-generation
    * stages would escape any plan audit. With capture enabled, every
    * [[small]] records the physical plan it is about to materialize, so
    * "no nested loops anywhere" is machine-checked across ALL stages,
    * not just the visible tail. */
  private val captured = scala.collection.mutable.ArrayBuffer.empty[String]
  private val capturedPlans =
    scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.execution.SparkPlan]
  @volatile private var capturing = false

  def startCapture(): Unit =
    synchronized { captured.clear(); capturedPlans.clear(); capturing = true }

  /** Stop capturing and return every sub-plan recorded since start. */
  def stopCapture(): Seq[String] =
    synchronized { capturing = false; captured.toList }

  /** Like [[stopCapture]] but returns the plan OBJECTS, for the
    * PlanGuard object-level walks (bounded-build-side proofs need the
    * tree, not its string). */
  def stopCapturePlans(): Seq[org.apache.spark.sql.execution.SparkPlan] =
    synchronized { capturing = false; capturedPlans.toList }

  /** Eagerly materialize a SMALL frame (candidate-pair lists, model-sized
    * artifacts) via `localCheckpoint`: computation runs now, lineage is
    * truncated so upstream `persist`ed inputs can be released immediately
    * (no recompute later), and the checkpoint blocks are reference-counted
    * by the ContextCleaner — freed when the frame is garbage-collected,
    * so long-lived sessions (Verify/Bench run 40+ queries in one session)
    * don't accumulate caches and callers owe no unpersist contract.
    *
    * Only for frames orders of magnitude smaller than the corpus; at
    * warehouse scale a production pipeline would write such results to a
    * table (localCheckpoint data is lost on executor failure — an
    * acceptable trade for intra-query candidate lists, not for outputs).
    */
  def small(df: DataFrame): DataFrame = {
    if (capturing) synchronized {
      val p = df.queryExecution.executedPlan
      captured += p.toString
      capturedPlans += p
    }
    df.localCheckpoint(eager = true)
  }

  /** Eagerly materialize a CORPUS-SCALE iteration frame (prefix-
    * doubling round tables, GD feature streams — one row per token
    * position or per doc×bucket): persist at MEMORY_AND_DISK and run
    * a count to populate the cache now, because iteration loops
    * consume each round frame 2–3× and would otherwise recompute the
    * whole upstream chain per use (~3^rounds work).
    *
    * Versus [[small]]: lineage is KEPT (a lost executor recomputes the
    * blocks instead of failing the query — localCheckpoint data dies
    * with its executor, acceptable for model-sized artifacts but not
    * for corpus-sized round state), and the CALLER owes an explicit
    * `unpersist()` as soon as the next round frame is materialized —
    * a loop that pins one corpus-sized block set per round for the
    * life of the query is exactly what this helper exists to prevent
    * (advisor r11). The FINAL frame a loop returns may stay persisted:
    * the ContextCleaner unpersists it when the Dataset is
    * garbage-collected, same lifecycle as [[small]]'s blocks. */
  def iteration(df: DataFrame): DataFrame = {
    if (capturing) synchronized {
      val p = df.queryExecution.executedPlan
      captured += p.toString
      capturedPlans += p
    }
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }
}
