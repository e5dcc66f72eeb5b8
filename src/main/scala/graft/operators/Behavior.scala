package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Behavioral analytics over event streams — ordered funnels and cohort
  * retention, the two queries every product/events warehouse runs daily
  * (north-star extension; the reference's event tooling stops at row-level
  * cleaning, cf. read_csv_s3_train.py:52-80).
  *
  * Scale shape: both operators hash-partition by the user key exactly once.
  * [[funnel]] computes every stage inside consecutive Window nodes over the
  * SAME partitioning (user), so Catalyst plans one Exchange and zero joins no
  * matter how many stages the funnel has; [[retention]] is the same
  * user-window pass followed by one map-side-combinable aggregation. Neither
  * collects, neither builds a per-user array, and per-user state inside the
  * window sort is O(1) — skewed power users cost sort time, not memory.
  */
object Behavior {

  /** Ordered conversion funnel with a per-step deadline. For each user,
    * stage 1 anchors at the user's FIRST `stages(0)` event; stage i+1 is the
    * first `stages(i+1)` event STRICTLY after stage i and within `windowSec`
    * seconds of it. Emits one row per user who entered the funnel:
    * `(user, t_<stage>..., stage_reached)` — later-stage timestamps are null
    * once a deadline is missed, `stage_reached` counts completed stages.
    *
    * Strictly-after matters: a click logged at the exact view timestamp is
    * not caused by it; ties break conservatively (not counted), identically
    * in the SQL oracle.
    *
    * Invariants (KernelProperties pins both on random event streams):
    * `stage_reached` counts completed stages, so per-stage user counts are
    * monotone non-increasing down the funnel; and wherever `t_<stage i+1>`
    * is non-null, `t_i < t_{i+1} <= t_i + windowSec` — anchors are strictly
    * ordered and each within its per-step deadline.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String, typeCol: String,
             stages: Seq[String], windowSec: Long): DataFrame = {
    require(stages.size >= 2, s"funnel needs >= 2 stages, got $stages")
    // A repeated stage name would silently overwrite its t_<stage> column
    // and anchor later stages on the wrong timestamp.
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct, got $stages")
    val w = Window.partitionBy(userCol)
    val stage0 = min(when(col(typeCol) === stages.head, col(tsCol))).over(w)
    // Each stage's anchor is the previous stage's bound column, so stage i+1
    // is one more Window over the SAME user partitioning — no re-shuffle.
    val withStages = stages.tail.zipWithIndex.foldLeft(
      events.withColumn(s"t_${stages.head}", stage0)) {
      case (df, (stage, i)) =>
        val prev = col(s"t_${stages(i)}")
        val hit = col(typeCol) === stage &&
          col(tsCol) > prev &&
          col(tsCol) <= prev + expr(s"INTERVAL $windowSec SECOND")
        df.withColumn(s"t_$stage", min(when(hit, col(tsCol))).over(w))
    }
    // All stage columns are per-user constants after the windows; min-agg
    // collapses the event rows back to one row per user without a join.
    val firstAgg = min(col(s"t_${stages.head}")).as(s"t_${stages.head}")
    val restAggs = stages.tail.map(s => min(col(s"t_$s")).as(s"t_$s"))
    withStages
      .groupBy(col(userCol))
      .agg(firstAgg, restAggs: _*)
      .where(col(s"t_${stages.head}").isNotNull)
      .withColumn("stage_reached",
        stages.map(s => when(col(s"t_$s").isNotNull, 1L).otherwise(0L))
          .reduce(_ + _))
  }

  /** Cohort retention: users are cohorted by the week of their first event;
    * activity is bucketed by whole days since that first event. Emits
    * `(cohort_week, day_offset, n_active)` — the classic retention triangle.
    *
    * One user-window pass pins the cohort anchor, one aggregation counts
    * distinct users per cell. `count(distinct user)` re-shuffles on the
    * (cohort, offset, user) triple first — both exchanges are partial-
    * aggregated, and the cell count is bounded by cohorts x horizon, not by
    * users.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(userCol)
    events
      .withColumn("_t0", min(col(tsCol)).over(w))
      .select(
        col(userCol),
        date_trunc("week", col("_t0")).cast("date").as("cohort_week"),
        datediff(col(tsCol).cast("date"), col("_t0").cast("date")).as("day_offset"))
      .groupBy("cohort_week", "day_offset")
      .agg(countDistinct(col(userCol)).as("n_active"))
  }
}
