package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-routing operators: conformance gating and entropy-based routing.
  *
  * Mirrors the reference's prep->input conformance gate
  * (`sql/02-input-tables.sql:319-348`, quarantine tables `:163-227`) and
  * the proposal builder's entropy routing
  * (`scripts/proposal-builder.ts:784-880`): groups whose per-member config
  * distribution is too fragmented (unique-ratio / Shannon entropy /
  * dominant-cluster share thresholds) are routed out of the main path.
  */
object Routing {

  /** Split rows into (conformant, quarantined-with-reasons). One pass,
    * two filters — Catalyst shares the scan. Each required column yields a
    * `reason_<col>` flag on the quarantine side. */
  def conformanceGate(df: DataFrame, required: Seq[String]): (DataFrame, DataFrame) = {
    val ok = required.map(c => col(c).isNotNull).reduce(_ && _)
    val conformant = df.filter(ok)
    val quarantined = required.foldLeft(df.filter(!ok)) { (d, c) =>
      d.withColumn(s"reason_$c", col(c).isNull)
    }
    (conformant, quarantined)
  }

  /** Per-group distribution metrics over a config/cluster key:
    * n_members, n_configs, unique_ratio, shannon entropy (bits),
    * dominant-cluster percent. (`scripts/proposal-builder.ts:809-872`.)
    */
  def entropyMetrics(df: DataFrame, group: Column, config: Column): DataFrame = {
    df.groupBy(group.as("grp"), config.as("cfg"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("grp"))
      .agg(
        sum(col("cnt")).as("n_members"),
        count(lit(1)).as("n_configs"),
        max(col("cnt")).as("max_cluster"),
        collect_list(col("cnt")).as("__cnts"))
      .withColumn("entropy",
        // sort_array fixes the accumulation order (collect_list order is
        // nondeterministic across partitionings; float sums are order-sensitive)
        round(-aggregate(sort_array(col("__cnts")), lit(0.0), (acc, c) =>
          acc + (c / col("n_members")) * log2(c / col("n_members"))), 6))
      .withColumn("unique_ratio",
        round(col("n_configs").cast("double") / col("n_members"), 6))
      .withColumn("dominant_pct",
        round(col("max_cluster") * 100.0 / col("n_members"), 2))
      .drop("__cnts")
  }

  /** Routing flags per group from the metrics, with the reference's
    * threshold semantics (`proposal-builder.ts:784-880`). Groups below
    * `minMembers` are never entropy-routed — a singleton group trivially
    * has unique_ratio 1.0 and would always trip the threshold. */
  def entropyRouting(
      metrics: DataFrame,
      maxUniqueRatio: Double = 0.5,
      maxEntropy: Double = 2.0,
      minDominantPct: Double = 50.0,
      minMembers: Int = 2): DataFrame =
    metrics.withColumn("route_pha",
      col("n_members") >= minMembers &&
        (col("unique_ratio") > maxUniqueRatio ||
          col("entropy") > maxEntropy ||
          col("dominant_pct") < minDominantPct))
}
