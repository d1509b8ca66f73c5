package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the last step of a pretraining data pipeline:
  * documents are concatenated in a deterministic order and cut into
  * fixed-capacity token sequences (the "greedy contiguous" packing most
  * training stacks use; documents may straddle a boundary and training
  * masks the seam). The relational form assigns every document its
  * (sequence id, offset) WITHOUT materializing concatenated text:
  * a running token count per shard does all the work.
  *
  * Scale (100 TB): one window shuffle keyed on the shard — shards exist
  * precisely so no single ordering partition holds the corpus (the
  * same two-phase reasoning as global row numbering). Each shard's
  * running sum is a linear pass; output is metadata (id → seq/offset),
  * joined back or fed straight to the sequence writer. */
object Packing {

  /** Assign (seq_id, seq_offset) per document: documents are ordered by
    * `orderCol` inside each `shard`, and sequences are filled greedily
    * to `seqLen` tokens. seq_id is shard-local (global id = shard ×
    * maxSeqPerShard or a (shard, seq_id) pair downstream). */
  def packSequences(df: DataFrame, orderCol: String, shard: Column,
                    tokens: Column, seqLen: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(orderCol), shard.as("shard"), tokens.as("n_tokens"))
      .withColumn("tok_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", (col("tok_before") / seqLen).cast("long"))
      .withColumn("seq_offset", col("tok_before") % seqLen)
  }
}
