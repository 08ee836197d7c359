package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PoliciesSpec extends SparkSpec {
  import spark.implicits._

  private val keyMappings = Seq(
    ("PR-EXACT", "G1", 2020, "A", "x"),
    ("PR-PLANWC", "G1", 2020, "A", "*"),
    ("PR-PRODWC", "G1", 2020, "*", "*"),
    ("PR-2018", "G1", 2018, "B", "y"),
    ("PR-2023", "G1", 2023, "B", "y"),
  ).toDF("proposal_id", "group_id", "yr", "product_code", "plan_code")

  private def policies(rows: (String, String, String, String, String)*) =
    rows.toSeq.toDF("policy_id", "group_id", "eff", "product_code", "plan_code")
      .withColumn("eff_date", to_date(col("eff"))).drop("eff")

  private def resolve(rows: (String, String, String, String, String)*) =
    Policies.resolveProposals(policies(rows: _*), keyMappings)
      .select(col("policy_id"), col("resolved_proposal_id"), col("match_tier"))
      .as[(String, Option[String], Option[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("tier 1: exact (group, year, product, plan)") {
    val got = resolve(("P1", "G1", "2020-06-01", "A", "x"))
    assert(got("P1") == ((Some("PR-EXACT"), Some(1))))
  }

  test("tier 2: plan wildcard when exact plan misses") {
    val got = resolve(("P2", "G1", "2020-06-01", "A", "zz"))
    assert(got("P2") == ((Some("PR-PLANWC"), Some(2))))
  }

  test("tier 3: product wildcard when product misses") {
    val got = resolve(("P3", "G1", "2020-06-01", "Q", "zz"))
    assert(got("P3") == ((Some("PR-PRODWC"), Some(3))))
  }

  test("tier 4: nearest year for exact product+plan (2021 -> 2023 over 2018)") {
    val got = resolve(("P4", "G1", "2021-06-01", "B", "y"))
    assert(got("P4") == ((Some("PR-2023"), Some(4)))) // |2023-2021|=2 < |2018-2021|=3
  }

  test("no match anywhere -> null proposal, policy row preserved") {
    val got = resolve(("P5", "G9", "2020-06-01", "A", "x"))
    assert(got("P5") == ((None, None)))
  }

  test("every policy resolves to exactly one row") {
    val out = Policies.resolveProposals(policies(
      ("P1", "G1", "2020-06-01", "A", "x"), ("P1b", "G1", "2020-06-01", "A", "x"),
      ("P5", "G9", "2020-01-01", "A", "x")), keyMappings)
    assert(out.count() == 3)
  }
}
