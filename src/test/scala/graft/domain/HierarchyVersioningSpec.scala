package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HierarchyVersioningSpec extends SparkSpec {
  import spark.implicits._

  test("signature changes open new versions; reverting reopens (islands)") {
    val obs = Seq(
      ("H1", "2020-01-01", "sigA"),
      ("H1", "2020-02-01", "sigA"), // same -> extends v1
      ("H1", "2020-03-01", "sigB"), // change -> v2
      ("H1", "2020-04-01", "sigA"), // revert -> v3 (new version, not v1)
      ("H2", "2020-01-01", "sigX"),
    ).toDF("k", "at_s", "sig").withColumn("at", to_timestamp(col("at_s")))
    val got = HierarchyVersioning.versionsFromObservations(obs, col("k"), col("at"), col("sig"))
      .select(col("key"), col("version_seq"), col("signature"),
        col("eff_from").cast("date").cast("string"), col("eff_to").cast("date").cast("string"))
      .as[(String, Long, String, String, String)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      ("H1", 1L, "sigA", "2020-01-01", "2020-02-29"),
      ("H1", 2L, "sigB", "2020-03-01", "2020-03-31"),
      ("H1", 3L, "sigA", "2020-04-01", "2099-01-01"),
      ("H2", 1L, "sigX", "2020-01-01", "2099-01-01")))
  }

  test("versioned hierarchies drive the calc as-of resolution end to end") {
    def d(s: String) = java.sql.Date.valueOf(s)
    // one hierarchy, broker changes B1 -> B9 at 2020-07-01
    val obs = Seq(
      ("H1", "2020-01-01", "0001:B1:S1"),
      ("H1", "2020-07-01", "0001:B9:S1"),
    ).toDF("k", "at_s", "sig").withColumn("at", to_timestamp(col("at_s")))
    val versions = HierarchyVersioning.versionsFromObservations(
      obs, col("k"), col("at"), col("sig"))
      .select(col("key").as("hierarchy_id"),
        concat_ws("-", col("key"), col("version_seq")).as("version_id"),
        col("eff_from").cast("date"), col("eff_to").cast("date"))
    // participants derived from each version's signature
    val participants = versions.select(col("version_id"),
        lit(1).as("tier_level"),
        when(col("version_id") === "H1-1", "B1").otherwise("B9").as("broker_id"),
        lit("S1").as("schedule_code"),
        lit(10.0).as("participant_rate"))
    val premiums = Seq(
      (1L, 1L, "G1", 100.0, d("2020-03-15")),  // -> version 1 (B1)
      (2L, 1L, "G1", 100.0, d("2020-09-15")),  // -> version 2 (B9)
    ).toDF("premium_id", "cert_id", "group_id", "amount", "txn_date")
    val certs = Seq((1L, "G1", "TX", 10, null.asInstanceOf[java.lang.Double], "A", "*"))
      .toDF("cert_id", "group_id", "state", "group_size", "real_rate", "product_code", "plan_code")
    val proposals = Seq(("PR1", "G1", d("2020-01-01"), null.asInstanceOf[java.sql.Date]))
      .toDF("proposal_id", "group_id", "eff_from", "eff_to")
    val splits = Seq(("PR1", 1, 100.0, "H1")).toDF("proposal_id", "split_seq", "split_pct", "hierarchy_id")
    val rates = Seq.empty[(String, String, String, Option[Int], Option[Int], Double)]
      .toDF("schedule_code", "product_code", "state", "size_from", "size_to", "rate")
    val assignments = Seq.empty[(String, String, Double, java.sql.Date, java.sql.Date)]
      .toDF("broker_id", "recipient_id", "assigned_pct", "eff_from", "eff_to")
    val fin = Calc.run(Calc.CalcInputs(premiums, certs, proposals, splits,
      versions, participants, rates, assignments))
    val got = fin.select(col("premium_id"), col("broker_id"), col("commission").cast("double"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "B1", 10.0), (2L, "B9", 10.0))) // right version per date
  }

  test("structure signature is order-insensitive over tier rows") {
    val tiers = Seq(
      ("H1", "2020-01-01", 2, "B2", "S2"),
      ("H1", "2020-01-01", 1, "B1", "S1"),
      ("H1", "2020-02-01", 1, "B1", "S1"),
      ("H1", "2020-02-01", 2, "B2", "S2"),
    ).toDF("k", "at", "tier_level", "broker_id", "schedule_code")
    val sigs = HierarchyVersioning.structureSignature(tiers, col("k"), col("at"))
      .select(col("signature")).as[String].collect()
    assert(sigs.distinct.length == 1) // same structure regardless of row order
    assert(sigs.head == "0001:B1:S1|0002:B2:S2")
  }
}
