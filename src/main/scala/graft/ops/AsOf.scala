package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the single latest
  * right row with the same key and `rightTime <= leftTime`.
  *
  * Spark has no native as-of join; the preference order (compose
  * built-ins before custom plans) applies and composition wins here:
  * tag both sides, UNION them, and run one `last_value(..., ignoreNulls)`
  * window per key ordered by time. That is ONE shuffle on the key and a
  * per-partition sort — no join at all, so there is no row-explosion
  * hazard and skewed keys degrade no worse than any windowed aggregate.
  * (A custom SortMergeAsOfExec would save only the union's extra columns;
  * not worth leaving the optimizer's cost model.)
  *
  * Tie semantics: a right row at exactly leftTime matches (<=), ensured
  * by sorting right rows before left rows at equal timestamps.
  */
object AsOf {

  /** @param left       left rows (kept 1:1 in the output)
    * @param right      right rows providing the as-of values
    * @param key        equi-join key column name (present on both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param valueCols  columns of `right` to carry (emitted as
    *                   `asof_<name>`, null when no prior right row)
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           valueCols: Seq[String]): DataFrame = {
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

    // right rows sort first at equal __t so "<=" ties match
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // fill ONE struct per window — all asof_ columns then come from the
    // SAME right row (per-column last(ignoreNulls) fills would mix
    // values from different right rows when a carried column is null).
    // The struct is null for left rows and non-null for every right row,
    // so a right row whose VALUE is null still correctly yields null.
    val rStruct = when(col("__is_left") === 0,
      struct(carried.map(c => col(s"__r_$c").as(c)): _*))
    val filled = unioned.withColumn("__s",
      last(rStruct, ignoreNulls = true).over(w))
    val unpacked = carried.foldLeft(filled) { (df, c) =>
      df.withColumn(s"asof_$c", col("__s").getField(c))
    }
    unpacked.filter(col("__is_left") === 1)
      .drop((Seq("__t", "__is_left", "__s") ++
        carried.map(c => s"__r_$c")): _*)
  }
}
