package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductionReadinessSpec extends SparkSpec {
  import spark.implicits._
  import ProductionReadiness._

  private def rep(checks: Seq[Check]) =
    report(checks).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getString(3)))).toMap

  test("status checks FAIL on wrong status codes") {
    val h = Seq(("H1", 1), ("H2", 0)).toDF("hierarchy_id", "status")
    val p = Seq(("P1", 2), ("P2", 2), ("P3", 1)).toDF("proposal_id", "status")
    val sv = Seq(("SV1", 1)).toDF("split_id", "status")
    val hv = Seq(("HV1", 1), ("HV2", 2)).toDF("version_id", "status")
    val m = rep(statusChecks(h, p, sv, hv))
    assert(m("hierarchies_not_active") == ((1L, "FAIL")))
    assert(m("proposals_not_approved") == ((1L, "FAIL")))
    assert(m("split_versions_not_active") == ((0L, "PASS")))
    assert(m("hierarchy_versions_not_active") == ((1L, "FAIL")))
  }

  test("fk checks count orphans; empty-string ids are treated as absent") {
    val hier = Seq("H1", "H2").toDF("hierarchy_id")
    val sp = Seq(("S1", "H1"), ("S2", "HX"), ("S3", null), ("S4", ""))
      .toDF("split_id", "hierarchy_id")
    val brokers = Seq("B1").toDF("broker_id")
    val hp = Seq(("HV1", "B1"), ("HV1", "B9")).toDF("version_id", "entity_id")
    val groups = Seq("G1").toDF("group_id")
    val props = Seq(("P1", "G1"), ("P2", "G9"), ("P3", null)).toDF("proposal_id", "group_id")
    val m = rep(fkChecks(sp, hier, hp, brokers, props, groups))
    assert(m("split_participants_invalid_hierarchy") == ((1L, "FAIL"))) // only HX
    assert(m("hierarchy_participants_invalid_broker") == ((1L, "FAIL")))
    assert(m("proposals_invalid_group") == ((1L, "FAIL")))
  }

  test("completeness: proposals-without-splits warns, hierarchy gaps fail") {
    val props = Seq("P1", "P2").toDF("proposal_id")
    val sv = Seq(("SV1", "P1")).toDF("split_id", "proposal_id")
    val hier = Seq("H1", "H2", "H3").toDF("hierarchy_id")
    val hv = Seq(("HV1", "H1"), ("HV2", "H2")).toDF("version_id", "hierarchy_id")
    val hp = Seq(Tuple1("HV1")).toDF("version_id")
    val m = rep(completenessChecks(props, sv, hier, hv, hp))
    assert(m("proposals_without_splits") == ((1L, "WARNING")))
    assert(m("hierarchies_without_versions") == ((1L, "FAIL")))
    assert(m("hierarchies_without_participants") == ((2L, "FAIL"))) // H2 (version, no part) + H3
  }

  test("quality checks grade INFO under the warning threshold") {
    val groups = (Seq(("G00000", "Group G00000"), ("G1", "Group G1"), ("G2", "Acme"))
      ++ (3 to 150).map(i => (s"G$i", s"Group $i"))).toDF("group_id", "name")
    val props = Seq(("P1", "B1"), ("P2", null), ("P3", "")).toDF("proposal_id", "broker_party_id")
    val m = rep(qualityChecks(groups, props))
    assert(m("groups_generic_names") == ((149L, "WARNING"))) // G1 + 148 numeric; DTC excluded
    assert(m("proposals_null_broker_party") == ((2L, "INFO")))
  }

  test("pha checks: non-DTC-with-proposal fails, size reconciles, hierarchy ids inform") {
    val policies = Seq(
      ("PL1", "G00000", "P1"), // DTC with proposal -> allowed in PHA
      ("PL2", "G1", null),     // unresolved -> expected in PHA
      ("PL3", "G1", "P3"),     // resolved non-DTC -> must NOT be in PHA
      ("PL4", "G2", "P4")      // resolved non-DTC, not in PHA
    ).toDF("policy_id", "group_id", "proposal_id")
    val pha = Seq(
      ("PL1", null), ("PL2", "H7"), ("PL3", null) // PL3 is the violation
    ).toDF("policy_id", "hierarchy_id")
    val m = rep(phaChecks(policies, pha))
    assert(m("pha_nondtc_with_proposal") == ((1L, "FAIL")))
    assert(m("pha_size_mismatch") == ((1L, "WARNING"))) // expected 2 (PL1,PL2), actual 3
    assert(m("pha_with_hierarchy") == ((1L, "INFO")))
  }

  test("chain health: thresholds, broken links, rate readiness") {
    val policies = Seq(
      ("PL1", "P1", "PRA", 100.0), // full chain, schedule rate for PRA
      ("PL2", "P2", "PRZ", 100.0), // no schedule rate for PRZ, participant rate
      ("PL3", "P3", "PRZ", 100.0), // no rate anywhere -> NOT ready
      ("PL4", null, "PRA", 100.0)  // unresolved -> out of scope
    ).toDF("policy_id", "proposal_id", "product_code", "premium")
    val pha = Seq(("PL1", "H1"), ("PL2", "H2"), ("PL3", "H3"), ("PL4", "H1"),
      ("PLX", "HX")).toDF("policy_id", "hierarchy_id")
    val hier = Seq("H1", "H2", "H3").toDF("hierarchy_id")
    val hv = Seq(("HV1", "H1"), ("HV2", "H2"), ("HV3", "H3"), ("HV9", "H1"))
      .toDF("version_id", "hierarchy_id")
    val hp = Seq(
      ("HV1", "S1", null.asInstanceOf[java.lang.Double]),
      ("HV2", "S9", java.lang.Double.valueOf(2.5)), // S9 has no rates
      ("HV3", "S9", null.asInstanceOf[java.lang.Double])
    ).toDF("version_id", "schedule_id", "commission_rate")
    val sched = Seq("S1", "S9").toDF("schedule_id")
    val schedV = Seq(("SCV1", "S1")).toDF("sched_version_id", "schedule_id")
    val rates = Seq(("SCV1", "PRA", 5.0)).toDF("sched_version_id", "product_code", "rate")

    val m = rep(
      countThresholdChecks(Seq(("policies", policies, 2L), ("pha", pha, 100L))) ++
        chainIntegrityChecks(pha, hier, hv, hp, sched, schedV, rates) :+
        rateReadinessCheck(policies, pha, hier, hv, hp, schedV, rates))
    assert(m("policies_below_min") == ((0L, "PASS")))
    assert(m("pha_below_min") == ((1L, "FAIL")))
    assert(m("pha_broken_hierarchy") == ((1L, "FAIL")))       // HX
    assert(m("versions_without_participants") == ((1L, "FAIL"))) // HV9
    assert(m("referenced_schedules_without_rates") == ((1L, "FAIL"))) // S9
    assert(m("chain_rows_without_rate") == ((1L, "FAIL")))    // PL3 only
  }

  test("presence checks fail only on empty tables; assessment gates READY") {
    val full = Seq(1).toDF("x")
    val empty = full.filter(lit(false))
    val m = rep(presenceChecks(Seq("brokers" -> full, "groups" -> empty)))
    assert(m("brokers_empty") == ((0L, "PASS")))
    assert(m("groups_empty") == ((1L, "FAIL")))

    val h = Seq(("H1", 1)).toDF("hierarchy_id", "status")
    val p = Seq(("P1", 2)).toDF("proposal_id", "status")
    val sv = Seq(("SV1", 1, "P1")).toDF("split_id", "status", "proposal_id")
    val hv = Seq(("HV1", 1, "H1")).toDF("version_id", "status", "hierarchy_id")
    val hp = Seq(("HV1", "B1")).toDF("version_id", "entity_id")
    val allGreen = report(
      statusChecks(h, p, sv, hv) ++
        completenessChecks(p, sv, h, hv, hp))
    val a = assessment(allGreen).collect()(0)
    assert(a.getLong(2) == 0L && a.getString(3) == "READY")

    val oneRed = report(
      statusChecks(h.withColumn("status", lit(0)), p, sv, hv) ++
        completenessChecks(p, sv, h, hv, hp))
    val b = assessment(oneRed).collect()(0)
    assert(b.getLong(2) == 1L && b.getString(3) == "NOT_READY")
  }
}
