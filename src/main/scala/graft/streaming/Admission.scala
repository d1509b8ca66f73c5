package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming DEDUP ADMISSION — the continuous form of the batch
  * incremental-dedup gate (SparkEntry q332): documents arrive as a
  * stream, and each must be admitted or rejected against EVERYTHING
  * seen so far, not just the current watermark horizon. That rules out
  * `dropDuplicatesWithinWatermark` (state expires with the watermark —
  * right for event streams, wrong for a corpus admission service where
  * "we already have this document" never expires).
  *
  * Shape: `flatMapGroupsWithState` keyed by the content fingerprint
  * (the q17/q18 normalized-text hash — computed upstream so this
  * operator is fingerprint-agnostic: exact md5, SimHash band, MinHash
  * band key all work). Per key, state is the keeper's doc id (16
  * bytes); each micro-batch emits one decision row per input doc:
  *   - `kept`            — first sighting of the fingerprint, ever
  *   - `dup_in_batch`    — lost the min-doc_id race inside its batch
  *   - `dup_vs_history`  — fingerprint admitted in an earlier batch
  * matching the q332 batch oracle's decision vocabulary exactly.
  *
  * Scale: state is ∝ DISTINCT fingerprints admitted — the same
  * history a batch admission job materializes as its distinct-
  * fingerprint table, here sharded across executors by the state
  * store and checkpointed with the query (restart resumes with
  * history intact, proven in the spec). NoTimeout is the point, not
  * an oversight: admission history is permanent by contract; the
  * state row is two longs, so a trillion-fingerprint corpus holds
  * ~16 GB/1000 executors. Batch frames run through the same operator
  * (Spark executes flatMapGroupsWithState per-group over empty state),
  * giving byte-identical decisions to the q332 batch path for a
  * first-ever batch.
  */
object Admission {

  /** One incoming document: id + upstream-computed fingerprint. */
  case class DocIn(doc_id: Long, fp: String)

  /** One admission decision. `kept_by` names the winning doc (itself,
    * for `kept` rows). */
  case class Decision(doc_id: Long, fp: String, decision: String,
                      kept_by: Long)

  private def admit(fp: String, rows: Iterator[DocIn],
                    state: GroupState[Long]): Iterator[Decision] = {
    // deterministic keep-first: the smallest doc_id in the batch wins,
    // matching q332's min(doc_id) keeper rule (batch order is not
    // meaningful; id order is reproducible)
    val batch = rows.toSeq.sortBy(_.doc_id)
    if (batch.isEmpty) Iterator.empty
    else if (state.exists) {
      val keeper = state.get
      batch.iterator.map(d => Decision(d.doc_id, fp, "dup_vs_history",
        keeper))
    } else {
      val keeper = batch.head
      state.update(keeper.doc_id)
      Iterator(Decision(keeper.doc_id, fp, "kept", keeper.doc_id)) ++
        batch.tail.iterator.map(d => Decision(d.doc_id, fp,
          "dup_in_batch", keeper.doc_id))
    }
  }

  /** Admission decisions for a (possibly streaming) dataset of
    * fingerprinted docs. Append-mode output; state never times out
    * (admission history is permanent by contract). */
  def admissionStream(docs: Dataset[DocIn]): Dataset[Decision] = {
    implicit val de = Encoders.product[Decision]
    implicit val le = Encoders.scalaLong
    implicit val se = Encoders.STRING
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(admit)
  }
}
