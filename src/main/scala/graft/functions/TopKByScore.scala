package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k-per-group aggregator: keeps the k (score, key) pairs with
  * the highest score (key ascending on ties) and finishes as the
  * comma-joined keys in rank order.
  *
  * Why an Aggregator and not a window: the window top-k (q30) must
  * shuffle EVERY row to its group partition before ranking; an
  * Aggregator partial-aggregates map-side, so each partition contributes
  * at most k pairs per group to the shuffle. At 100 TB that is the
  * difference between moving the corpus and moving numGroups·k rows.
  * The buffer is a pair of parallel Seqs (scores, keys) — a Product, so
  * it rides the standard tuple encoder without kryo.
  *
  * The per-reduce sort is O(k log k) with k expected tiny (top-3/top-10);
  * a production variant for large k would keep an insertion point or a
  * bounded heap, but the shuffle-volume argument is identical.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), (Seq[Double], Seq[Long]), String] {

  private def norm(s: Seq[(Double, Long)]): (Seq[Double], Seq[Long]) = {
    val t = s.sortBy { case (score, key) => (-score, key) }.take(k)
    (t.map(_._1), t.map(_._2))
  }

  override def zero: (Seq[Double], Seq[Long]) = (Nil, Nil)

  override def reduce(b: (Seq[Double], Seq[Long]),
                      a: (Double, Long)): (Seq[Double], Seq[Long]) =
    norm(b._1.zip(b._2) :+ a)

  override def merge(x: (Seq[Double], Seq[Long]),
                     y: (Seq[Double], Seq[Long])): (Seq[Double], Seq[Long]) =
    norm(x._1.zip(x._2) ++ y._1.zip(y._2))

  override def finish(b: (Seq[Double], Seq[Long])): String =
    b._2.mkString(",")

  override def bufferEncoder: Encoder[(Seq[Double], Seq[Long])] =
    Encoders.product[(Seq[Double], Seq[Long])]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
