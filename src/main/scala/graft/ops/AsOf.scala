package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the single closest
  * right row with the same key: the latest with `rightTime <= leftTime`
  * (backward, the default), the earliest with `rightTime >= leftTime`
  * (forward), or whichever of the two is nearer in time (nearest), each
  * optionally bounded by a tolerance.
  *
  * Spark has no native as-of join; the preference order (compose
  * built-ins before custom plans) applies and composition wins here:
  * tag both sides, UNION them, and run one `last_value(..., ignoreNulls)`
  * window per key ordered by time. That is ONE shuffle on the key and a
  * per-partition sort — no join at all, so there is no row-explosion
  * hazard and skewed keys degrade no worse than any windowed aggregate.
  * (A custom SortMergeAsOfExec would save only the union's extra columns;
  * not worth leaving the optimizer's cost model.) `nearest` adds a
  * second window over the SAME partitioning (one extra in-partition sort,
  * no extra shuffle).
  *
  * Tie semantics: a right row at exactly leftTime matches in every
  * direction (both bounds inclusive), ensured by sorting right rows
  * before left rows at equal timestamps; `nearest` prefers the backward
  * match when both sides are equidistant. Value determinism requires
  * `(key, rightTime)` unique on the right (multiple right rows at the
  * same instant have no defined winner — same contract as the native
  * AsOfJoinExec).
  */
object AsOf {

  /** @param left       left rows (kept 1:1 in the output)
    * @param right      right rows providing the as-of values
    * @param key        equi-join key column name (present on both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param valueCols  columns of `right` to carry (emitted as
    *                   `asof_<name>`, null when no matching right row)
    * @param direction  "backward" (default), "forward", or "nearest"
    * @param tolerance  max |rightTime − leftTime| for a match — any
    *                   expression comparable after subtraction from the
    *                   time columns (an INTERVAL literal for timestamps,
    *                   a number for numeric times)
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           valueCols: Seq[String],
           direction: String = "backward",
           tolerance: Option[Column] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val l = left.withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
    val carried = valueCols :+ rightTime
    // a right row with a null key or null time can never match any left
    // row (SQL comparison semantics — same contract as the native
    // AsOfJoinExec and a correlated max-subquery): drop before the union
    val r = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(
        (col(key) +: col(rightTime).as("__t") +: lit(0).as("__is_left") +:
          carried.map(c => col(c).as(s"__r_$c"))): _*)
    val lPadded = l.select(
      (l.columns.map(col).toSeq ++
        carried.map(c => lit(null).as(s"__r_$c"))): _*)
    val unioned = lPadded.unionByName(r, allowMissingColumns = true)

    // right rows sort first at equal __t in BOTH scan directions so
    // exact-time ties match inclusively
    val wB = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy(col(key))
      .orderBy(col("__t").desc, col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // fill ONE struct per window — all asof_ columns then come from the
    // SAME right row (per-column last(ignoreNulls) fills would mix
    // values from different right rows when a carried column is null).
    // The struct is null for left rows and non-null for every right row,
    // so a right row whose VALUE is null still correctly yields null.
    val rStruct = when(col("__is_left") === 0,
      struct(carried.map(c => col(s"__r_$c").as(c)): _*))
    // tolerance masks (null/true when unbounded); evaluated on a filled
    // struct s, with __t = the left row's time on every surviving row
    def okB(s: Column) = tolerance
      .map(t => s.getField(rightTime) >= col("__t") - t).getOrElse(lit(true))
    def okF(s: Column) = tolerance
      .map(t => s.getField(rightTime) <= col("__t") + t).getOrElse(lit(true))
    val filled = direction match {
      case "backward" =>
        val f = unioned.withColumn("__s0",
          last(rStruct, ignoreNulls = true).over(wB))
        f.withColumn("__s", when(okB(col("__s0")), col("__s0"))).drop("__s0")
      case "forward" =>
        val f = unioned.withColumn("__s0",
          last(rStruct, ignoreNulls = true).over(wF))
        f.withColumn("__s", when(okF(col("__s0")), col("__s0"))).drop("__s0")
      case "nearest" =>
        val f = unioned
          .withColumn("__sb", last(rStruct, ignoreNulls = true).over(wB))
          .withColumn("__sf", last(rStruct, ignoreNulls = true).over(wF))
        val rb = col("__sb").getField(rightTime)
        val rf = col("__sf").getField(rightTime)
        val bValid = col("__sb").isNotNull && coalesce(okB(col("__sb")), lit(false))
        val fValid = col("__sf").isNotNull && coalesce(okF(col("__sf")), lit(false))
        f.withColumn("__s",
            when(bValid && fValid,
              when(col("__t") - rb <= rf - col("__t"), col("__sb"))
                .otherwise(col("__sf")))
              .when(bValid, col("__sb"))
              .when(fValid, col("__sf")))
          .drop("__sb", "__sf")
    }
    val unpacked = carried.foldLeft(filled) { (df, c) =>
      df.withColumn(s"asof_$c", col("__s").getField(c))
    }
    unpacked.filter(col("__is_left") === 1)
      .drop((Seq("__t", "__is_left", "__s") ++
        carried.map(c => s"__r_$c")): _*)
  }
}
