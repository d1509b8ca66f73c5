package graft.ops

import org.apache.spark.sql.DataFrame

/** Cache-lifecycle helpers for multi-stage ops (LSH candidate pipelines)
  * that persist intermediate frames consumed by several downstream joins.
  */
private[graft] object Caches {

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
  def small(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)
}
