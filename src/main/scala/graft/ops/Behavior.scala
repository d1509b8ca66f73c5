package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the event stream: funnel conversion and
  * cohort retention — the two classic "did the user come back / convert"
  * questions a product-analytics engine answers (reference analogue:
  * the event-table aggregations of `script.py`'s polling pipeline,
  * generalized to ordered user journeys).
  *
  * Scale shape: both operators are user-keyed aggregations — each funnel
  * stage is one groupBy(user) min() plus one user-keyed join (stage
  * chains are short, 3-5 stages, so the plan is a handful of co-keyed
  * shuffles AQE coalesces), and cohorts are two user-keyed aggregations.
  * Nothing is ever ordered globally and no per-user state exceeds a few
  * timestamps, so 100 TB of events with 10⁹ users shards cleanly on the
  * user key. */
object Behavior {

  /** Ordered funnel: for each user the earliest time of stage i STRICTLY
    * AFTER their stage i-1 time (the standard ordered-funnel semantics —
    * a purchase before the first click does not count), optionally
    * within `windowSeconds` of the previous stage (the "converted
    * within 2 hours" form every product funnel actually uses). Returns
    * one row per user with nullable per-stage times `t0..t{n-1}`. */
  def funnelTimes(events: DataFrame, user: String, etype: String,
                  ts: String, stages: Seq[String],
                  windowSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    var cur = events.filter(col(etype) === stages.head)
      .groupBy(col(user)).agg(min(col(ts)).as("t0"))
    stages.tail.zipWithIndex.foreach { case (s, i) =>
      val prev = s"t$i"
      val nxt = events.filter(col(etype) === s)
        .select(col(user), col(ts).as("__ts"))
      // interval arithmetic (not epoch-second casts): keeps microsecond
      // precision so the bound matches the oracle's `+ INTERVAL` exactly
      val inWindow = windowSeconds match {
        case Some(w) => col("__ts") <= col(prev) + expr(s"INTERVAL $w SECOND")
        case None => lit(true)
      }
      val step = cur.join(nxt, Seq(user))
        .filter(col("__ts") > col(prev) && inWindow)
        .groupBy(col(user)).agg(min(col("__ts")).as(s"t${i + 1}"))
      cur = cur.join(step, Seq(user), "left")
    }
    cur
  }

  /** Funnel summary: users reaching each stage (in order), as
    * (stage_idx, stage, users). */
  def funnel(events: DataFrame, user: String, etype: String, ts: String,
             stages: Seq[String],
             windowSeconds: Option[Long] = None): DataFrame = {
    val times = funnelTimes(events, user, etype, ts, stages, windowSeconds)
    val aggs = stages.indices.map(i => count(col(s"t$i")).as(s"c$i"))
    val counts = times.agg(aggs.head, aggs.tail: _*)
    val spark = events.sparkSession
    import spark.implicits._
    val idx = stages.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("stage_idx", "stage")
    counts.crossJoin(broadcast(idx))
      .select(col("stage_idx"), col("stage"),
        stages.indices.map(i =>
          when(col("stage_idx") === i, col(s"c$i")))
          .reduce(coalesce(_, _)).as("users"))
  }

  /** Absolute week index of a timestamp: whole weeks since Monday
    * 1970-01-05 — pure integer date arithmetic both engines reproduce
    * exactly (avoids engine-specific week-of-year conventions). */
  def weekIndex(ts: Column): Column =
    floor(datediff(to_date(ts), to_date(lit("1970-01-05"))) / 7)
      .cast("long")

  /** Cohort retention: users bucketed by their FIRST-activity week
    * (the cohort), then counted per (cohort_week, week_offset) of later
    * activity — the retention triangle. `users` counts distinct users
    * active in that offset week. */
  def cohortRetention(events: DataFrame, user: String, ts: String): DataFrame = {
    val weekly = events
      .select(col(user).as("__u"), weekIndex(col(ts)).as("__w"))
      .distinct()
    val cohort = weekly.groupBy("__u").agg(min(col("__w")).as("__cw"))
    weekly.join(cohort, Seq("__u"))
      .groupBy(col("__cw").as("cohort_week"),
        (col("__w") - col("__cw")).as("week_offset"))
      .agg(count(lit(1)).as("users"))
  }
}
