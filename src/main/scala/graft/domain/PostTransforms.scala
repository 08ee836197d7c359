package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cleaning
import graft.operators.Joins

/** Post-core transforms (SURVEY §7.1 module 5): premium transactions (10),
  * commission assignments (12), conformance analysis (08-analyze). */
object PostTransforms {

  /** Premium transactions with the policy-premium fallback
    * (`sql/transforms/10-premium-transactions.sql:56-88`): certificates
    * with no premium rows get a synthetic transaction from the
    * certificate's own premium, dated one month after the effective date
    * (`DATEADD` shape at `:40`). Union + anti-join, deterministic
    * natural-key transaction ids (NOT ROW_NUMBER-over-everything — W1). */
  def premiumTransactions(premiums: DataFrame, certificates: DataFrame): DataFrame = {
    val real = premiums.select(
      concat_ws("-", lit("PT"), col("cert_id"), col("premium_id")).as("txn_id"),
      col("cert_id"), col("group_id"), col("amount"), col("txn_date"),
      lit("PREMIUM").as("source"))
    val covered = premiums.select(col("cert_id")).distinct()
    val fallback = certificates
      .join(covered, Seq("cert_id"), "left_anti")
      .filter(col("premium").isNotNull && col("premium") > 0)
      .select(
        concat_ws("-", lit("PT"), col("cert_id"), lit("CERT")).as("txn_id"),
        col("cert_id"), col("group_id"),
        col("premium").as("amount"),
        add_months(col("eff_date"), 1).as("txn_date"),
        lit("CERT_FALLBACK").as("source"))
    real.unionByName(fallback)
  }

  /** Latest assignment per broker (`sql/transforms/
    * 12-commission-assignments.sql:50-53`, W2) with recipient existence
    * validation (J8 semi). */
  def latestAssignments(rawAssignments: DataFrame, brokers: DataFrame): DataFrame =
    Joins.top1PerGroup(
      rawAssignments, Seq(col("broker_id")),
      Seq(col("eff_from").desc, col("assignment_id").desc))
      .join(brokers.select(col("broker_ext_id").as("recipient_id")), Seq("recipient_id"), "left_semi")

  /** Conformance analysis (`sql/transforms/08-analyze-conformance.sql`):
    * per group — certificate counts, conformant percentage (conditional
    * aggregates, `:138-141`), sanitized plan codes (`:37-43`), sorted
    * distinct matched-plan debug string (`:83`, A3). */
  def conformanceReport(configs: DataFrame, certificates: DataFrame): DataFrame = {
    val plans = certificates
      .select(col("group_id"), Cleaning.toWildcard(col("plan_code")).as("plan_code"))
      .groupBy(col("group_id"))
      .agg(concat_ws(",", sort_array(collect_set(col("plan_code")))).as("plan_codes"))
    configs.groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_certs"),
        sum(when(col("nonconformant"), 0).otherwise(1)).as("n_conformant"),
        sum(when(col("nonconformant"), 1).otherwise(0)).as("n_nonconformant"))
      .withColumn("conformant_pct",
        round(col("n_conformant") * 100.0 / col("n_certs"), 2).cast("decimal(5,2)"))
      .join(plans, Seq("group_id"), "left")
  }
}
