package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TransfereeFixSpec extends SparkSpec {
  import spark.implicits._

  private def certs(rows: (Long, Int, String, String, String)*) =
    rows.toSeq.toDF("cert_id", "split_seq", "broker_id", "paid_broker_id", "eff")
      .withColumn("eff_date", to_date(col("eff"))).drop("eff")

  test("capture: latest reassignment per split broker; self-payment ignored") {
    val c = certs(
      (1L, 1, "B1", "R1", "2020-01-01"),
      (2L, 1, "B1", "R2", "2020-06-01"), // later -> wins
      (3L, 1, "B2", "B2", "2020-01-01"), // self-paid -> no capture
    )
    val got = TransfereeFix.captureAssignments(c)
      .select(col("broker_id"), col("recipient_id")).as[(String, String)].collect().toSet
    assert(got == Set(("B1", "R2")))
  }

  test("transferee fix: assignment onto another earner is dropped") {
    val c = certs(
      (1L, 1, "B1", "B2", "2020-01-01"), // B2 is itself an earner -> drop
      (2L, 1, "B2", "R9", "2020-01-01"), // R9 is an outsider -> keep
    )
    val got = TransfereeFix.assignments(c)
      .select(col("broker_id"), col("recipient_id")).as[(String, String)].collect().toSet
    assert(got == Set(("B2", "R9")))
  }

  test("fixed assignments feed the calc: only the outsider transfer applies") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val c = certs(
      (1L, 1, "B1", "B2", "2020-01-01"),
      (2L, 1, "B2", "R9", "2020-01-01"))
    val assigns = TransfereeFix.assignments(c)
    val premiums = Seq((10L, 1L, "G1", 100.0, d("2020-06-15")))
      .toDF("premium_id", "cert_id", "group_id", "amount", "txn_date")
    val calcCerts = Seq((1L, "G1", "TX", 1, null.asInstanceOf[java.lang.Double], "A", "*"))
      .toDF("cert_id", "group_id", "state", "group_size", "real_rate", "product_code", "plan_code")
    val proposals = Seq(("PR1", "G1", d("2020-01-01"), null.asInstanceOf[java.sql.Date]))
      .toDF("proposal_id", "group_id", "eff_from", "eff_to")
    val splits = Seq(("PR1", 1, 50.0, "H1"), ("PR1", 2, 50.0, "H2"))
      .toDF("proposal_id", "split_seq", "split_pct", "hierarchy_id")
    val versions = Seq(
      ("H1", "V1", d("2020-01-01"), null.asInstanceOf[java.sql.Date]),
      ("H2", "V2", d("2020-01-01"), null.asInstanceOf[java.sql.Date]))
      .toDF("hierarchy_id", "version_id", "eff_from", "eff_to")
    val participants = Seq(
      ("V1", 1, "B1", "S1", Some(10.0)), ("V2", 1, "B2", "S1", Some(10.0)))
      .toDF("version_id", "tier_level", "broker_id", "schedule_code", "participant_rate")
    val rates = Seq.empty[(String, String, String, Option[Int], Option[Int], Double)]
      .toDF("schedule_code", "product_code", "state", "size_from", "size_to", "rate")
    val fin = Calc.run(Calc.CalcInputs(premiums, calcCerts, proposals, splits,
      versions, participants, rates, assigns))
    val gl = Calc.glEntries(fin)
      .select(col("broker_id"), col("entry_type"), col("amount").cast("double"))
      .as[(String, String, Double)].collect().toSet
    // B1's transfer to B2 was dropped (B2 earns) -> B1 keeps 5.0 Original;
    // B2's commission is fully assigned to outsider R9
    assert(gl == Set(("B1", "Original", 5.0), ("R9", "Assigned", 5.0)))
  }
}
