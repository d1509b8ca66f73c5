package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: the value whose order key is smallest — the
  * agg-shaped form of the reference's keep-first dedup (SURVEY.md §2.7's
  * "per-key first-by-order" aggregator), for `Dataset.groupByKey(...)
  * .agg(...)` pipelines where compile-time typing is wanted. The untyped
  * equivalents (`min_by`, window row_number) remain the default in the
  * DataFrame layer; this is the typed-API surface.
  *
  * Input rows are (orderKey, value); the buffer is one (order, value,
  * seen) triple — constant size, partial-aggregated map-side, merged by
  * pure min. `finish` yields the first value (null when the group had no
  * rows, which cannot happen under groupByKey).
  */
class FirstByOrder[V](implicit bufEnc: Encoder[(Long, V, Boolean)],
                      outEnc: Encoder[V])
    extends Aggregator[(Long, V), (Long, V, Boolean), V] {

  override def zero: (Long, V, Boolean) =
    (Long.MaxValue, null.asInstanceOf[V], false)

  override def reduce(b: (Long, V, Boolean), a: (Long, V)): (Long, V, Boolean) =
    if (!b._3 || a._1 < b._1) (a._1, a._2, true) else b

  override def merge(x: (Long, V, Boolean), y: (Long, V, Boolean)): (Long, V, Boolean) =
    if (!x._3) y else if (!y._3) x else if (x._1 <= y._1) x else y

  override def finish(b: (Long, V, Boolean)): V = b._2

  override def bufferEncoder: Encoder[(Long, V, Boolean)] = bufEnc
  override def outputEncoder: Encoder[V] = outEnc
}

object FirstByOrder {
  /** String-valued convenience instance. */
  def forString: FirstByOrder[String] = {
    implicit val b: Encoder[(Long, String, Boolean)] =
      Encoders.product[(Long, String, Boolean)]
    implicit val o: Encoder[String] = Encoders.STRING
    new FirstByOrder[String]
  }
}
