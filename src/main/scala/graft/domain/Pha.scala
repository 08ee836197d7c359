package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PHA (policy-holder-assignment) generation and the state-rule cascade.
  *
  * PHA path (`scripts/proposal-builder.ts:1189-1279`): every
  * non-conformant (cert, split) gets a FRESH per-certificate hierarchy +
  * version + participants + assignment — deliberately no dedup (each
  * PHA is certificate-scoped). Ids are natural keys `PHA-{cert}-{seq}`.
  *
  * State-rule cascade (`proposal-builder.ts:1308-1459`; SQL twin
  * `sql/transforms/08-hierarchy-splits.sql:28-317`): per
  * (hierarchy version x state) one rule; per (rule x product) one split;
  * per (split x participant) one distribution with the equal
  * `100 / participantCount` percentage — three chained explodes with a
  * window count, no driver loops.
  */
object Pha {

  /** Non-conformant (cert, split) rows -> PHA hierarchy/version/
    * participant entities. Input: routed configs + the per-split tier
    * rows (hierHashes shape). */
  def phaEntities(routedConfigs: DataFrame, hierHashes: DataFrame): DataFrame = {
    val phaCerts = routedConfigs.filter(col("route_pha")).select(col("cert_id"))
    hierHashes.join(phaCerts, Seq("cert_id"), "left_semi")
      .select(col("cert_id"), col("split_seq"), col("split_pct"), col("tiers"))
      .withColumn("pha_hierarchy_id",
        concat_ws("-", lit("PHA"), col("cert_id"), col("split_seq")))
      .withColumn("version_id", concat_ws("-", col("pha_hierarchy_id"), lit("V1")))
      .withColumn("t", explode(col("tiers")))
      .select(col("cert_id"), col("split_seq"), col("split_pct"),
        col("pha_hierarchy_id"), col("version_id"),
        col("t.tier_level").as("tier_level"),
        col("t.broker_id").as("broker_id"),
        col("t.schedule_code").as("schedule_code"))
  }

  /** versions x states -> rules; rules x products -> splits;
    * splits x participants -> distributions with pct = 100/count. */
  def stateRuleCascade(
      versions: DataFrame,      // version_id
      states: DataFrame,        // version_id, state
      products: DataFrame,      // version_id, product_code
      participants: DataFrame   // version_id, broker_id
  ): DataFrame = {
    val rules = versions.select(col("version_id"))
      .join(states, Seq("version_id"))
      .withColumn("rule_id", concat_ws("-", col("version_id"), col("state")))
    val splits = rules.join(products, Seq("version_id"))
      .withColumn("split_id", concat_ws("-", col("rule_id"), col("product_code")))
    val withParts = splits.join(participants, Seq("version_id"))
    val w = Window.partitionBy(col("split_id"))
    withParts
      .withColumn("n_participants", count(lit(1)).over(w))
      // equal distribution: 100/count at the reference's DECIMAL(5,2)
      .withColumn("distribution_pct",
        round(lit(100.0) / col("n_participants"), 2).cast("decimal(5,2)"))
      .select(col("version_id"), col("state"), col("rule_id"),
        col("product_code"), col("split_id"), col("broker_id"),
        col("n_participants"), col("distribution_pct"))
  }
}
