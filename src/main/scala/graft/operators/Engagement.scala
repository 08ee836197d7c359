package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Events-side composite flagship: the cohort engagement report every
  * product-analytics stack derives from a raw event stream, assembled
  * from the engine's own primitives — [[Intervals.sessionize]] (gap
  * sessions), [[Stats.funnel]] (ordered conversion), weekly activity for
  * retention, and DECIMAL-exact monetization.
  */
object Engagement {

  /** Per acquisition-cohort week (ISO Monday of each user's first-seen
    * day): users, gap-sessions, ordered-funnel conversions
    * (`funnelStages`, last stage = the conversion event whose `value`
    * monetizes), week-1 retention, and converted value. `conv_value`
    * sums conversion-event revenue of FUNNEL-COMPLETING users only
    * (stage >= funnelStages.size) — purchases by users who skipped an
    * earlier stage are excluded, matching the column's name.
    *
    * Scale shape: one per-user session window (skew bounded by a user's
    * events), the stage-per-user funnel joins (all keyed on user_id —
    * partitioning reused), a distinct (user, week) activity frame, and
    * ONE cohort-week-sized final aggregate. Percentages are single
    * double divisions of exact longs; money sums as DECIMAL and leaves
    * as double.
    *
    * Returns one row per cohort_week: (cohort_week, n_users, n_sessions,
    * sessions_per_user, n_converted, conv_pct, wk1_retained,
    * wk1_retention_pct, conv_value). */
  def cohortEngagement(
      df: DataFrame, user: Column, ts: Column, eventType: Column,
      value: Column, gapSeconds: Long, funnelStages: Seq[String]): DataFrame = {
    require(funnelStages.nonEmpty, "need at least one funnel stage")
    val e = df.select(user.as("user_id"), ts.as("ts"),
      eventType.as("event_type"), value.as("value"))
    val sess = Intervals.sessionize(e, col("user_id"), col("ts"), gapSeconds)
      .groupBy(col("user_id")).agg(max(col("session_seq")).as("n_sessions"))
    val cohorts = e.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("first_day"))
      .withColumn("cohort_week", date_trunc("week", col("first_day")).cast("date"))
      .select(col("user_id"), col("cohort_week"))
    val weekly = e.select(col("user_id"),
      date_trunc("week", to_date(col("ts"))).cast("date").as("wk")).distinct()
    val wk1 = cohorts.join(weekly, Seq("user_id"))
      .filter(col("wk") === date_add(col("cohort_week"), 7))
      .select(col("user_id")).distinct().withColumn("retained", lit(1L))
    val stages = Stats.funnel(e, col("user_id"), col("ts"),
      col("event_type"), funnelStages).select(col("user_id"), col("stage"))
    val conv = e.filter(col("event_type") === funnelStages.last)
      .groupBy(col("user_id"))
      .agg(sum(round(col("value"), 6).cast("decimal(18,6)")).as("pval"))
    cohorts
      .join(sess, Seq("user_id"), "left")
      .join(wk1, Seq("user_id"), "left")
      .join(stages, Seq("user_id"), "left")
      .join(conv, Seq("user_id"), "left")
      .groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("n_sessions"), lit(0L))).as("n_sessions"),
        sum(when(col("stage") >= funnelStages.size, 1L).otherwise(0L))
          .as("n_converted"),
        sum(coalesce(col("retained"), lit(0L))).as("wk1_retained"),
        // conv_value means what it says: revenue of users who COMPLETED
        // the ordered funnel — a purchase without the full view→click
        // path does not monetize the cohort row
        sum(when(col("stage") >= funnelStages.size,
            coalesce(col("pval"), lit(0).cast("decimal(18,6)")))
          .otherwise(lit(0).cast("decimal(18,6)"))).as("__val"))
      .select(col("cohort_week"), col("n_users"), col("n_sessions"),
        round(col("n_sessions") / col("n_users"), 6).as("sessions_per_user"),
        col("n_converted"),
        round(col("n_converted") * lit(100.0) / col("n_users"), 6).as("conv_pct"),
        col("wk1_retained"),
        round(col("wk1_retained") * lit(100.0) / col("n_users"), 6)
          .as("wk1_retention_pct"),
        col("__val").cast("double").as("conv_value"))
  }
}
