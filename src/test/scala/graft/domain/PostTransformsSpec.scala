package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PostTransformsSpec extends SparkSpec {
  import spark.implicits._

  test("latestAssignments: top-1 per broker by eff_from with recipient validation") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val raw = Seq(
      (1L, "B1", "R1", 50.0, d("2020-01-01")),
      (2L, "B1", "R2", 75.0, d("2021-01-01")), // latest for B1
      (3L, "B2", "RX", 10.0, d("2020-01-01")), // recipient unknown -> dropped
    ).toDF("assignment_id", "broker_id", "recipient_id", "assigned_pct", "eff_from")
    val brokers = Seq("R1", "R2").toDF("broker_ext_id")
    val got = PostTransforms.latestAssignments(raw, brokers)
      .select(col("broker_id"), col("recipient_id"), col("assigned_pct"))
      .as[(String, String, Double)].collect().toSet
    assert(got == Set(("B1", "R2", 75.0)))
  }

  test("column profiler: nulls, distincts, min/max in one pass") {
    val df = Seq((Some(1), "a"), (None, "b"), (Some(3), "b")).toDF("x", "y")
    val got = Audit.profile(df)
      .select(col("column"), col("n_nulls"), col("min"), col("max"))
      .as[(String, Long, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("x") == ((1L, Some("1"), Some("3"))))
    assert(got("y") == ((0L, Some("a"), Some("b"))))
  }

  test("conformanceReport: conditional-aggregate percentages + sanitized plan list") {
    val configs = Seq(
      (1L, "G1", false), (2L, "G1", false), (3L, "G1", true), (4L, "G2", false))
      .toDF("cert_id", "group_id", "nonconformant")
    val certs = Seq(
      (1L, "G1", "PL1"), (2L, "G1", "N/A"), (3L, "G1", "PL2"), (4L, "G2", null))
      .toDF("cert_id", "group_id", "plan_code")
    val got = PostTransforms.conformanceReport(configs, certs)
      .select(col("group_id"), col("n_certs"), col("conformant_pct").cast("string"),
        col("plan_codes"))
      .as[(String, Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("G1") == ((3L, "66.67", "*,PL1,PL2"))) // N/A -> '*', sorted
    assert(got("G2") == ((1L, "100.00", "*")))
  }
}
