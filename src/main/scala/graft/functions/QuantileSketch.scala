package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KLL-style mergeable quantile sketch (Karnin–Lang–Liberty, FOCS'16
  * simplified): fixed-size compactor levels where a level-i item carries
  * weight 2^i. Insert appends at level 0; an over-full level is SORTED
  * and its odd-indexed half promoted one level up (each survivor
  * represents itself and its dropped neighbor — rank error ≤ its weight
  * per compaction). Merge concatenates levels pairwise and re-compacts.
  *
  * Why this is the 100 TB shape for quantiles, vs the exact
  * `percentile_approx`/sort paths (q38/q107): the state is O(k · log(n/k))
  * REGARDLESS of group size, partial-aggregates map-side, and merges
  * associatively — so one pass over a 100 TB table yields per-group
  * quantile summaries that can themselves be unioned later (day-level
  * sketches → month-level quantiles without re-reading the data), the
  * property no exact method has.
  *
  * Determinism: compaction keeps alternating parities of the SORTED
  * buffer — odd indices on one compaction, even on the next, tracked by
  * a flip counter in the state (no RNG — unlike the randomized-offset
  * original). A fixed parity would systematically erode one tail (keep-
  * odd always drops each pair's minimum, so after L levels the true
  * p≈0 quantile is gone); alternation cancels that bias to first order
  * while a given insertion order still yields a bit-identical sketch.
  * The result depends on partition order (like every mergeable sketch
  * under Spark's nondeterministic partitioning), hence spec-gated rather
  * than oracle-gated: the spec proves rank-error bounds and
  * merge-grouping invariance, the honest guarantees.
  *
  * Reference analogue: the summary statistics the reference computes
  * exactly at toy scale (exo_2.py's describe-style profiling) need a
  * mergeable sketch at warehouse scale.
  */
final case class KllState(n: Long, flips: Long, levels: Seq[Seq[Double]])

object KllSketch {

  /** Per-level capacity: FLAT k (total memory k·log₂(n/k)). The
    * original's geometrically shrinking lower levels only keep the
    * error bound with RANDOM compaction offsets (signs cancel in
    * variance); with deterministic alternation the per-level error is
    * worst-case Σᵢ mᵢ·wᵢ/2 = L·n/2k for mᵢ = n/(k·wᵢ) compactions of
    * weight wᵢ — small capacities would blow the n/2c term up, so every
    * level gets the full k. */
  private def capacity(k: Int, level: Int, numLevels: Int): Int = k

  val empty: KllState = KllState(0L, 0L, Vector(Vector.empty))

  /** Force Vector-backed levels: after an encoder round trip (shuffle
    * boundary) the Seqs deserialize as array-backed wrappers whose `:+`
    * copies the whole buffer — O(k) per INSERT on the hot path. The
    * one-time O(size) normalization here keeps every subsequent append
    * effectively O(1). Values are unchanged, so the sketch stays
    * bit-identical for a given insertion order. */
  private def vec(ls: Seq[Seq[Double]]): Vector[Vector[Double]] =
    ls match {
      case v: Vector[_] if ls.forall(_.isInstanceOf[Vector[_]]) =>
        v.asInstanceOf[Vector[Vector[Double]]]
      case _ => ls.iterator.map(_.toVector).toVector
    }

  def insert(s: KllState, x: Double, k: Int): KllState = {
    val lv = vec(s.levels)
    val l0 = lv.head :+ x
    val st = KllState(s.n + 1, s.flips, lv.updated(0, l0))
    // fast path: level 0 under capacity — no level can have grown, so
    // skip the full compaction scan (the per-row hot path)
    if (l0.size <= k) st else compact(st, k)
  }

  def merge(a: KllState, b: KllState, k: Int): KllState = {
    val (av, bv) = (vec(a.levels), vec(b.levels))
    val h = math.max(av.size, bv.size)
    val both = (0 until h).map { i =>
      av.applyOrElse(i, (_: Int) => Vector.empty[Double]) ++
        bv.applyOrElse(i, (_: Int) => Vector.empty[Double])
    }.toVector
    compact(KllState(a.n + b.n, a.flips + b.flips, both), k)
  }

  /** Enforce capacities bottom-up: sort an over-full level, promote the
    * alternating-parity half (weight doubles), keep none of it here. */
  @annotation.tailrec
  def compact(s: KllState, k: Int): KllState = {
    val h = s.levels.size
    val idx = s.levels.zipWithIndex
      .indexWhere { case (l, i) => l.size > capacity(k, i, h) }
    if (idx < 0) s
    else {
      val sorted = s.levels(idx).sorted
      val parity = (s.flips % 2).toInt
      val promoted = sorted.indices.collect {
        case i if i % 2 == parity => sorted(i)
      }.toVector
      val base =
        if (idx + 1 < h) s.levels
        else s.levels :+ Vector.empty[Double] // grow a level for promotion
      val next = base
        .updated(idx, Vector.empty[Double])
        .updated(idx + 1, (base(idx + 1) ++ promoted).toVector)
      compact(KllState(s.n, s.flips + 1, next), k)
    }
  }

  /** Rank-based quantile estimate: flatten to (value, weight=2^level),
    * sort by value, return the first value whose cumulative weight
    * reaches p·W (quantile_disc semantics over the weighted sample). */
  def quantile(s: KllState, p: Double): Double = {
    val weighted = s.levels.zipWithIndex.flatMap { case (l, i) =>
      l.map(v => (v, 1L << i))
    }.sortBy(_._1)
    require(weighted.nonEmpty, "quantile of an empty sketch")
    val total = weighted.map(_._2).sum
    val target = math.max(1L, math.ceil(p * total).toLong)
    var acc = 0L
    weighted.find { case (_, w) => acc += w; acc >= target }.get._1
  }
}

/** Typed Aggregator over a Double column → quantile estimates at
  * `probs`. Map-side partial sketches, associative reduce/merge —
  * `ds.groupByKey(...).agg(new QuantileSketchAgg(128, probs).toColumn)`
  * or untyped via `udaf(...)`. */
class QuantileSketchAgg(k: Int, probs: Seq[Double])
    extends Aggregator[Double, KllState, Seq[Double]] {

  override def zero: KllState = KllSketch.empty

  override def reduce(b: KllState, x: Double): KllState =
    KllSketch.insert(b, x, k)

  override def merge(a: KllState, b: KllState): KllState =
    KllSketch.merge(a, b, k)

  override def finish(s: KllState): Seq[Double] =
    probs.map(p => KllSketch.quantile(s, p))

  override def bufferEncoder: Encoder[KllState] = Encoders.product[KllState]

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Mutable holder so [[KllQuantiles]]' per-row update is one field write
  * plus the (immutable, structurally shared) sketch insert — no
  * per-row encoder round trip. */
final class KllBuffer(var state: KllState)

/** Native `TypedImperativeAggregate` form of [[QuantileSketchAgg]] —
  * IDENTICAL sketch algorithm and therefore bit-identical estimates for
  * a given insertion order (it delegates to the same [[KllSketch]]
  * kernel), but ~20× cheaper per row: the `udaf(Aggregator)` wrapper
  * (ScalaAggregator) pays an ExpressionEncoder round trip per input row
  * and drags every co-grouped aggregate in the same Aggregate operator
  * off the vectorized path with it (measured on q151 at sf0.1: the
  * mixed udaf+percentile one-row aggregate cost 2.7 s where this form's
  * plan runs it in ~0.4 s). The buffer lives as a JVM object inside
  * ObjectHashAggregate and serializes only at the partial/final
  * boundary, via a flat little-endian double stream.
  *
  * Null inputs are skipped (SQL aggregate convention); an empty group
  * evaluates to null rather than throwing. Neither occurs in the gated
  * queries — prices and event values are non-null.
  */
case class KllQuantiles(child: org.apache.spark.sql.catalyst.expressions.Expression,
    k: Int, probs: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[KllBuffer]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[org.apache.spark.sql.catalyst.expressions.Expression] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types._

  override def createAggregationBuffer(): KllBuffer =
    new KllBuffer(KllSketch.empty)

  override def update(b: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null)
      b.state = KllSketch.insert(b.state, v.asInstanceOf[Double], k)
    b
  }

  override def merge(b: KllBuffer, o: KllBuffer): KllBuffer = {
    b.state = KllSketch.merge(b.state, o.state, k)
    b
  }

  override def eval(b: KllBuffer): Any =
    if (b.state.n == 0L) null
    else new GenericArrayData(
      probs.map(p => KllSketch.quantile(b.state, p)).toArray)

  override def serialize(b: KllBuffer): Array[Byte] = {
    val s = b.state
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(s.n); out.writeLong(s.flips); out.writeInt(s.levels.size)
    s.levels.foreach { l =>
      out.writeInt(l.size); l.foreach(out.writeDouble)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readLong(); val flips = in.readLong()
    val levels = Vector.fill(in.readInt()) {
      Vector.fill(in.readInt())(in.readDouble())
    }
    new KllBuffer(KllState(n, flips, levels))
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
  override def prettyName: String = "kll_quantiles"
}

object KllQuantiles {
  /** Column form: `kllQuantiles(col("v"), 512, Seq(0.25, 0.5))`. */
  def kllQuantiles(c: org.apache.spark.sql.Column, k: Int,
                   probs: Seq[Double]): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      KllQuantiles(org.apache.spark.sql.GraftSqlBridge.expressionEager(c),
        k, probs).toAggregateExpression())
}
