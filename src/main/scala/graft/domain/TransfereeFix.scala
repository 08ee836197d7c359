package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Commission assignment capture + the transferee fix
  * (`scripts/proposal-builder.ts:642-662` capture; exclusion spec
  * `README.md:311-335`, J12).
  *
  * Capture: wherever a certificate row pays a different broker than the
  * split broker (SplitBrokerId != PaidBrokerId), record an assignment
  * split-broker -> paid-broker, keeping the LATEST observation per split
  * broker (W2 top-1 by certificate effective date).
  *
  * Transferee fix: an assignment is honored only when the transferee
  * (paid broker) is NOT itself an earner (a split broker anywhere in the
  * population) — a reassignment onto an active earner would double-pay;
  * those assignments are dropped and the split broker keeps the
  * commission (`WHERE NOT EXISTS (... earners)` in the reference's
  * deprecated 07/11 scripts).
  */
object TransfereeFix {

  /** Latest split->paid assignment per split broker, self-payments
    * excluded. Output matches Calc's assignments contract. */
  def captureAssignments(certificates: DataFrame): DataFrame =
    Joins.top1PerGroup(
      certificates
        .filter(col("paid_broker_id").isNotNull &&
          col("broker_id") =!= col("paid_broker_id")),
      part = Seq(col("broker_id")),
      order = Seq(col("eff_date").desc, col("cert_id").desc, col("split_seq").desc))
      .select(col("broker_id"), col("paid_broker_id").as("recipient_id"),
        lit(100.0).as("assigned_pct"),
        col("eff_date").as("eff_from"),
        lit(null).cast("date").as("eff_to"))

  /** Drop assignments whose recipient is an earner elsewhere. */
  def applyTransfereeFix(assignments: DataFrame, certificates: DataFrame): DataFrame = {
    val earners = certificates.select(col("broker_id").as("__earner")).distinct()
    assignments.join(earners, col("recipient_id") === col("__earner"), "left_anti")
  }

  /** Capture + fix in one call. */
  def assignments(certificates: DataFrame): DataFrame =
    applyTransfereeFix(captureAssignments(certificates), certificates)
}
