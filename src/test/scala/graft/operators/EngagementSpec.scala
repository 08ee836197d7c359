package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EngagementSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("cohortEngagement: sessions, funnel, wk1 retention, value per cohort") {
    // 2024-01-01 is a Monday -> cohort week 2024-01-01.
    val ev = Seq(
      // user 1: two sessions on day 1 (gap > 30 min), full funnel,
      // active again in week 2 -> retained
      (1L, t("2024-01-01 10:00:00"), "view", 0.0),
      (1L, t("2024-01-01 10:10:00"), "click", 0.0),
      (1L, t("2024-01-01 12:00:00"), "purchase", 25.0),
      (1L, t("2024-01-08 09:00:00"), "view", 0.0),
      // user 2: one session, stalls at view, never returns
      (2L, t("2024-01-02 10:00:00"), "view", 0.0),
      // user 3: cohort week 2 (Jan 8), one session, purchase WITHOUT the
      // view->click prefix -> not converted by the ordered funnel
      (3L, t("2024-01-08 10:00:00"), "purchase", 10.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = Engagement.cohortEngagement(ev, col("user_id"), col("ts"),
        col("event_type"), col("value"), 1800L, Seq("view", "click", "purchase"))
      .select(col("cohort_week").cast("string"), col("n_users"), col("n_sessions"),
        col("sessions_per_user"), col("n_converted"), col("conv_pct"),
        col("wk1_retained"), col("wk1_retention_pct"), col("conv_value"))
      .as[(String, Long, Long, Double, Long, Double, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val w1 = got("2024-01-01")
    // user 1: sessions = [10:00-10:10][12:00][Jan8 09:00] = 3; user 2: 1
    assert((w1._2, w1._3, w1._4) == ((2L, 4L, 2.0)))
    assert((w1._5, w1._6) == ((1L, 50.0)))   // only user 1 converts
    assert((w1._7, w1._8) == ((1L, 50.0)))   // only user 1 returns in wk2
    assert(w1._9 == 25.0)                    // user 1's purchase value
    val w2 = got("2024-01-08")
    assert((w2._2, w2._3, w2._5) == ((1L, 1L, 0L))) // ordered funnel: no prefix
    assert(w2._9 == 0.0)  // not funnel-converted -> purchase doesn't monetize
    assert((w2._7, w2._8) == ((0L, 0.0)))
  }
}
