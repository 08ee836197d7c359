package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Named production-readiness verification — the reference's pre-export
  * verify suite as a queryable report instead of PRINT statements.
  *
  * Twins, check for check:
  *  - `sql/verify/verify-production-readiness.sql` (status fields §1,
  *    FK integrity §2, completeness §3, data quality §4, final
  *    assessment);
  *  - `sql/verify/verify-pha-cleanup.sql:115-216` (§5 data-quality
  *    checks + size reconciliation);
  *  - `sql/verify/verify-commission-requirements.sql:134-178` (§5
  *    critical data presence).
  *
  * Each check is a named count with the reference's severity semantics
  * (FAIL / WARNING / INFO thresholds). Everything is one stacked union of
  * 1-row aggregates — each check an independent anti-join/filter + count,
  * so Spark runs them as parallel scan+agg jobs and no check ever
  * collects row data to the driver.
  */
object ProductionReadiness {

  /** Severity grading, mirroring the reference's PRINT branches. */
  sealed trait Grade
  /** n>0 → FAIL (blocking). */
  case object FailOver0 extends Grade
  /** n>0 → WARNING (non-blocking but counted where the ref counts it). */
  case object WarnOver0 extends Grade
  /** n>warnOver → WARNING, n>0 → INFO (informational thresholds, e.g.
    * generic group names at 100, null broker ids at 1000). */
  final case class Graded(warnOver: Long) extends Grade

  /** A named check: `counted` must be a 1x1 frame with column
    * `n_failing`. Build via [[Check.rows]] (count of failing rows) or
    * [[Check.stat]] (precomputed scalar, e.g. a size reconciliation). */
  final case class Check(suite: String, name: String, counted: DataFrame, grade: Grade)
  object Check {
    def rows(suite: String, name: String, failing: DataFrame, grade: Grade = FailOver0): Check =
      Check(suite, name, failing.agg(count(lit(1)).as("n_failing")), grade)
    def stat(suite: String, name: String, scalar: DataFrame, grade: Grade): Check =
      Check(suite, name, scalar, grade)
  }

  private def severity(grade: Grade) = grade match {
    case FailOver0 => when(col("n_failing") > 0, "FAIL").otherwise("PASS")
    case WarnOver0 => when(col("n_failing") > 0, "WARNING").otherwise("PASS")
    case Graded(w) => when(col("n_failing") > w, "WARNING")
      .when(col("n_failing") > 0, "INFO").otherwise("PASS")
  }

  /** Stack checks into (suite, check, n_failing, severity). */
  def report(checks: Seq[Check]): DataFrame =
    checks.map { c =>
      c.counted.select(lit(c.suite).as("suite"), lit(c.name).as("check"),
        col("n_failing").cast("long").as("n_failing"),
        severity(c.grade).as("severity"))
    }.reduce(_ unionByName _)

  /** Final assessment (`verify-production-readiness.sql:163-189`): the
    * reference counts exactly its six named critical checks (the three
    * blocking status checks + the three completeness checks — FK counts
    * are printed but not totalled there; they gate via FAIL severity
    * here). READY iff none of the counted checks fired. */
  val countedChecks: Seq[String] = Seq(
    "hierarchies_not_active", "proposals_not_approved",
    "split_versions_not_active", "proposals_without_splits",
    "hierarchies_without_versions", "hierarchies_without_participants")

  def assessment(rep: DataFrame, counted: Seq[String] = countedChecks): DataFrame =
    rep.filter(col("check").isin(counted: _*) && col("n_failing") > 0)
      .agg(count(lit(1)).as("n_failing"))
      .select(lit("assessment").as("suite"), lit("critical_issues").as("check"),
        col("n_failing").cast("long").as("n_failing"),
        when(col("n_failing") === 0, "READY").otherwise("NOT_READY").as("severity"))

  /** §1 status fields: staged entities must carry their export-ready
    * status codes (hierarchy/split/version Active=1, proposal
    * Approved=2). */
  def statusChecks(hierarchies: DataFrame, proposals: DataFrame,
                   splitVersions: DataFrame, hierarchyVersions: DataFrame): Seq[Check] = Seq(
    Check.rows("status", "hierarchies_not_active", hierarchies.filter(col("status") =!= 1)),
    Check.rows("status", "proposals_not_approved", proposals.filter(col("status") =!= 2)),
    Check.rows("status", "split_versions_not_active", splitVersions.filter(col("status") =!= 1)),
    Check.rows("status", "hierarchy_versions_not_active", hierarchyVersions.filter(col("status") =!= 1)))

  /** §2 FK integrity: orphan references, as anti-joins (never an IN
    * subquery materialized on the driver). Empty-string ids are treated
    * as absent, like the reference's `<> ''` guards. */
  def fkChecks(splitParticipants: DataFrame, hierarchies: DataFrame,
               hierarchyParticipants: DataFrame, brokers: DataFrame,
               proposals: DataFrame, groups: DataFrame): Seq[Check] = Seq(
    Check.rows("fk", "split_participants_invalid_hierarchy",
      splitParticipants.filter(col("hierarchy_id").isNotNull && col("hierarchy_id") =!= "")
        .join(hierarchies.select(col("hierarchy_id")), Seq("hierarchy_id"), "left_anti")),
    Check.rows("fk", "hierarchy_participants_invalid_broker",
      hierarchyParticipants.join(
        brokers.select(col("broker_id").as("entity_id")), Seq("entity_id"), "left_anti")),
    Check.rows("fk", "proposals_invalid_group",
      proposals.filter(col("group_id").isNotNull && col("group_id") =!= "")
        .join(groups.select(col("group_id")), Seq("group_id"), "left_anti")))

  /** §3 completeness: entities that downstream calculation cannot use.
    * Proposals without splits WARN (commissions just can't compute);
    * hierarchies without versions/participants FAIL. */
  def completenessChecks(proposals: DataFrame, splitVersions: DataFrame,
                         hierarchies: DataFrame, hierarchyVersions: DataFrame,
                         hierarchyParticipants: DataFrame): Seq[Check] = Seq(
    Check.rows("completeness", "proposals_without_splits",
      proposals.join(splitVersions.select(col("proposal_id")), Seq("proposal_id"), "left_anti"),
      WarnOver0),
    Check.rows("completeness", "hierarchies_without_versions",
      hierarchies.join(hierarchyVersions.select(col("hierarchy_id")), Seq("hierarchy_id"), "left_anti")),
    Check.rows("completeness", "hierarchies_without_participants",
      hierarchies.join(
        hierarchyVersions.join(hierarchyParticipants.select(col("version_id")), Seq("version_id"))
          .select(col("hierarchy_id")),
        Seq("hierarchy_id"), "left_anti")))

  /** §4 data quality: informational-threshold checks. */
  def qualityChecks(groups: DataFrame, proposals: DataFrame): Seq[Check] = Seq(
    Check.rows("quality", "groups_generic_names",
      groups.filter((col("name").like("Group G%") || col("name").rlike("^Group [0-9]"))
        && col("group_id") =!= "G00000"),
      Graded(warnOver = 100)),
    Check.rows("quality", "proposals_null_broker_party",
      proposals.filter(col("broker_party_id").isNull || col("broker_party_id") === ""),
      Graded(warnOver = 1000)))

  /** `verify-pha-cleanup.sql` §5: the PHA (policy-hierarchy-assignment)
    * table must hold exactly the DTC + proposal-unresolved policies. */
  def phaChecks(policies: DataFrame, pha: DataFrame): Seq[Check] = {
    val expected = policies
      .filter(col("group_id") === "G00000" || col("proposal_id").isNull)
      .agg(count(lit(1)).as("expected"))
    val actual = pha.select(col("policy_id")).distinct().agg(count(lit(1)).as("actual"))
    Seq(
      Check.rows("pha", "pha_nondtc_with_proposal",
        pha.select(col("policy_id")).distinct()
          .join(policies.filter(col("proposal_id").isNotNull && col("group_id") =!= "G00000"),
            Seq("policy_id"), "left_semi")),
      // size reconciliation: |expected - actual| as the failing count
      Check.stat("pha", "pha_size_mismatch",
        expected.crossJoin(actual)
          .select(abs(col("expected") - col("actual")).as("n_failing")),
        WarnOver0),
      Check.rows("pha", "pha_with_hierarchy",
        pha.filter(col("hierarchy_id").isNotNull), Graded(warnOver = Long.MaxValue)))
  }

  /** `verify-commission-requirements.sql:134-178` §5: every critical
    * staging table must be non-empty before export. */
  def presenceChecks(tables: Seq[(String, DataFrame)]): Seq[Check] =
    tables.map { case (name, df) =>
      Check.stat("presence", s"${name}_empty",
        df.agg(when(count(lit(1)) === 0, 1L).otherwise(0L).as("n_failing")),
        FailOver0)
    }

  // ===== chain health (`sql/utils/verify-chain-health.sql`) =====

  /** Test 1 (`verify-chain-health.sql:14-39`): key tables must exceed
    * their expected-magnitude floors. */
  def countThresholdChecks(tables: Seq[(String, DataFrame, Long)]): Seq[Check] =
    tables.map { case (name, df, min) =>
      Check.stat("chain", s"${name}_below_min",
        df.agg(when(count(lit(1)) > min, 0L).otherwise(1L).as("n_failing")),
        FailOver0)
    }

  /** Test 2 (`verify-chain-health.sql:41-81`): broken links along the
    * assignment chain. The hierarchy→version and proposal-side links are
    * covered by [[completenessChecks]]; these are the remaining three. */
  def chainIntegrityChecks(pha: DataFrame, hierarchies: DataFrame,
                           hierarchyVersions: DataFrame, participants: DataFrame,
                           schedules: DataFrame, scheduleVersions: DataFrame,
                           scheduleRates: DataFrame): Seq[Check] = Seq(
    Check.rows("chain", "pha_broken_hierarchy",
      pha.filter(col("hierarchy_id").isNotNull)
        .join(hierarchies.select(col("hierarchy_id")), Seq("hierarchy_id"), "left_anti")),
    Check.rows("chain", "versions_without_participants",
      hierarchyVersions.join(participants.select(col("version_id")), Seq("version_id"), "left_anti")),
    // only schedules actually referenced by participants need rates
    Check.rows("chain", "referenced_schedules_without_rates",
      participants.select(col("schedule_id")).distinct()
        .join(schedules.select(col("schedule_id")), Seq("schedule_id"), "left_semi")
        .join(scheduleVersions
          .join(scheduleRates.select(col("sched_version_id")), Seq("sched_version_id"))
          .select(col("schedule_id")).distinct(),
          Seq("schedule_id"), "left_anti")))

  /** Test 3 (`verify-chain-health.sql:84-117`): commission-calculation
    * readiness — every resolvable policy must reach a rate through
    * schedule rates (product-matched) or a participant-level commission
    * rate. The reference spot-checks 5 random chain rows; here the check
    * is exhaustive (count of chain rows with NO resolvable rate), which
    * is both stronger and deterministic. */
  def rateReadinessCheck(policies: DataFrame, pha: DataFrame, hierarchies: DataFrame,
                         hierarchyVersions: DataFrame, participants: DataFrame,
                         scheduleVersions: DataFrame, scheduleRates: DataFrame): Check = {
    val chain = policies
      .filter(col("proposal_id").isNotNull && col("premium") > 0)
      .join(pha.filter(col("hierarchy_id").isNotNull), Seq("policy_id"))
      .join(hierarchies.select(col("hierarchy_id")), Seq("hierarchy_id"))
      .join(hierarchyVersions.select(col("version_id"), col("hierarchy_id")), Seq("hierarchy_id"))
      .join(participants, Seq("version_id"))
    val rated = chain
      .join(scheduleVersions.select(col("schedule_id"), col("sched_version_id")),
        Seq("schedule_id"), "left")
      .join(scheduleRates.select(col("sched_version_id"),
        col("product_code"), col("rate").as("sched_rate")),
        Seq("sched_version_id", "product_code"), "left")
    Check.rows("chain", "chain_rows_without_rate",
      rated.filter(col("sched_rate").isNull && col("commission_rate").isNull))
  }
}
