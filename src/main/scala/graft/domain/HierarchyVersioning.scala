package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal hierarchy versioning — the semantics of
  * `sql/transforms/07-deprecated-hierarchies.sql`: a hierarchy's structure
  * is observed over time (one ordered structure signature per observation,
  * the `STRING_AGG ... WITHIN GROUP` comparison at `:71-74`); when the
  * signature CHANGES, the current version closes at the next version's
  * start minus one day and a new version opens; a signature reverting to
  * an earlier structure still opens a NEW version (islands, not global
  * dedup — `:266` keeps the `'2099-01-01'` open end on the latest).
  *
  * Pure window-function formulation: change-detection via lag, version
  * numbering via running sum, range closing via lead — one shuffle on the
  * hierarchy key.
  */
object HierarchyVersioning {

  /** From (key, observed_at, signature) observations to
    * (key, version_seq, signature, eff_from, eff_to) version rows.
    * `eff_to` of the latest version = the `'2099-01-01'` open-end sentinel.
    *
    * Observations are DEDUPED first: a repeated (key, observed_at,
    * signature) row is the same observation, and after dedup
    * (observed_at, signature) is a TOTAL order per key. That totality is
    * load-bearing — with duplicate rows the lag window and the
    * running-sum window may resolve tied peers in different physical
    * orders (observed in DuckDB at sf0.1: an island split into two
    * version_seq values), so any engine replicating this must dedup the
    * same way.
    *
    * Callers whose observations are unique per (key, observed_at) BY
    * CONSTRUCTION (e.g. [[structureSignature]], which group-bys on
    * exactly that pair) pass `assumeDistinct = true` to skip the dedup
    * shuffle — uniqueness on (key, observed_at) alone already makes the
    * order total. */
  def versionsFromObservations(
      obs: DataFrame, key: Column, observedAt: Column, signature: Column,
      assumeDistinct: Boolean = false): DataFrame = {
    val projected = obs.select(key.as("key"), observedAt.as("__at"), signature.as("__sig"))
    val o = if (assumeDistinct) projected else projected.distinct()
    val byKey = Window.partitionBy(col("key")).orderBy(col("__at"), col("__sig"))
    val flagged = o
      .withColumn("__prev_sig", lag(col("__sig"), 1).over(byKey))
      .withColumn("__chg",
        when(col("__prev_sig").isNull || col("__prev_sig") =!= col("__sig"), 1).otherwise(0))
      .withColumn("version_seq", sum(col("__chg")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val versions = flagged
      .groupBy(col("key"), col("version_seq"), col("__sig").as("signature"))
      .agg(min(col("__at")).as("eff_from"))
    graft.operators.Windows.leadClose(versions,
        Seq(col("key")), Seq(col("eff_from"), col("version_seq")), "eff_from", "eff_to")
      .withColumn("eff_to",
        coalesce(col("eff_to"), to_timestamp(lit(Sentinels.OpenEnd))))
  }

  /** Structure signature from tier rows — ordered STRING_AGG equality
    * class (`07-deprecated-hierarchies.sql:71-74`). */
  def structureSignature(tiers: DataFrame, key: Column, obsAt: Column): DataFrame =
    tiers
      .withColumn("__item", concat_ws(":",
        lpad(col("tier_level").cast("string"), 4, "0"),
        col("broker_id"), col("schedule_code")))
      .groupBy(key.as("key"), obsAt.as("observed_at"))
      .agg(concat_ws("|", sort_array(collect_list(col("__item")))).as("signature"))
}
