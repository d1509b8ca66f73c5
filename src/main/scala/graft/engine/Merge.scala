package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed upsert (MERGE) semantics — the reference's update-then-insert
  * pair (`exo_1.py:134-170`, `exo_2.py:287-308`: per-row UPDATE loop +
  * `to_sql` append) re-expressed set-at-a-time.
  *
  * Scale notes (100 TB): `upsert` is one left-anti shuffle join on the
  * key plus a union — Catalyst plans a hash-partitioned anti join, and AQE
  * converts it to a broadcast anti join automatically whenever the incoming
  * batch's key set is small (the common incremental case: a micro-batch of
  * thousands of keys against a warehouse of billions). With a transactional
  * table format (Delta/Iceberg) the same call site would emit `MERGE INTO`;
  * the plain-Parquet rewrite is kept behind this interface so that can slot
  * in without touching callers (SURVEY.md §7.4).
  */
object Merge {

  /** MERGE-as-antijoin-union: every incoming row wins over the existing
    * row with the same key; existing rows with unmatched keys survive.
    * Equivalent to `MERGE ... WHEN MATCHED THEN UPDATE SET * WHEN NOT
    * MATCHED THEN INSERT *` — and idempotent: re-merging the same batch
    * is a no-op (property-tested in MergeSpec). */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val incomingKeys = incoming.select(keys.map(col): _*).distinct()
    existing
      .join(incomingKeys, keys, "left_anti")
      .unionByName(incoming.select(existing.columns.map(col).toIndexedSeq: _*))
  }

  /** Anti-join "new rows" detection (`exo_1.py:199-204` `isin`-negation):
    * incoming rows whose key is absent from existing. */
  def newRows(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")
}
