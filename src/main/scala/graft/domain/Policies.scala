package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Policy -> proposal resolution: the reference's 4-tier matching
  * waterfall (`sql/transforms/09-policies.sql:128-180`, J6+J7):
  *
  *  1. exact (group, year, product, plan)
  *  2. plan wildcard — mapping rows with plan_code `'*'`
  *  3. product wildcard — mapping rows with product_code `'*'`
  *  4. year-adjacent — exact product+plan in the nearest other year
  *     (`ROW_NUMBER() OVER (... ORDER BY ABS(EffectiveYear - year))`,
  *     `09-policies.sql:165-180`)
  *
  * One equi join on group_id (mappings fan out configuration-sized per
  * group), tier + year-distance ranking, top-1 per policy. Unmatched
  * policies survive with a null proposal (left join).
  */
object Policies {

  def resolveProposals(policies: DataFrame, keyMappings: DataFrame): DataFrame = {
    val pol = policies.withColumn("pol_yr", year(col("eff_date")))
    // No broadcast hint: key mappings are data-dependent (proposals x years x
    // products x plans — multi-GB at 100x reference scale). The join has an
    // equi key (group_id); let AQE pick broadcast vs shuffle by actual size.
    val km = keyMappings.select(
      col("proposal_id"), col("group_id").as("km_group"), col("yr"),
      col("product_code").as("km_product"), col("plan_code").as("km_plan"))
    val joined = pol.join(km, pol("group_id") === col("km_group"), "left")
    val prodEq = col("km_product") === pol("product_code")
    val planEq = col("km_plan") === pol("plan_code")
    val sameYr = col("yr") === col("pol_yr")
    val tier =
      when(sameYr && prodEq && planEq, 1)
        .when(sameYr && prodEq && col("km_plan") === "*", 2)
        .when(sameYr && col("km_product") === "*", 3)
        .when(prodEq && planEq, 4) // other year, ranked by |yr - pol_yr|
    val candidates = joined
      .withColumn("match_tier", tier)
      // non-candidates (join miss or no tier) keep a row but rank last
      .withColumn("__yr_dist",
        when(col("match_tier").isNotNull, abs(col("yr") - col("pol_yr"))).otherwise(lit(null)))
    Joins.top1PerGroup(candidates,
      Seq(col("policy_id")),
      Seq(col("match_tier").asc_nulls_last, col("__yr_dist").asc_nulls_last,
        col("proposal_id").asc_nulls_last))
      .withColumn("resolved_proposal_id",
        when(col("match_tier").isNotNull, col("proposal_id")))
      .drop("km_group", "km_product", "km_plan", "yr", "proposal_id", "__yr_dist")
  }
}
