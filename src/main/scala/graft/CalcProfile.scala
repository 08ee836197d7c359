package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.domain._

/** Stage-by-stage profiler for the 8-stage calc on the DomainBench synth
  * inputs — `java -cp ... graft.CalcProfile [sfDir]`. Each stage is timed
  * by materializing its output with all upstream frames pre-materialized,
  * so the printed cost is that stage's own join/window work, not lineage
  * recompute. Diagnostic surface only (like PlanCheck).
  */
object CalcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.getOrCreate("graft-calc-profile")
    spark.range(1000).selectExpr("sum(id)").collect()

    def mat(df: DataFrame): DataFrame = df.localCheckpoint(true)
    def phase(name: String)(f: => Long): Unit = {
      val s = System.nanoTime()
      val n = f
      System.err.println(f"[calc-stage] $name: ${(System.nanoTime() - s) / 1e9}%.2f s ($n rows)")
    }

    var certs: DataFrame = null; var hh: DataFrame = null; var cfg: DataFrame = null
    var props: DataFrame = null; var splits: DataFrame = null
    var versions: DataFrame = null; var participants: DataFrame = null
    phase("0 synthCertificates") {
      certs = mat(DomainBench.synthCertificates(spark, sfDir)); certs.count() }
    phase("0 hierarchyHashes")   { hh = mat(Proposals.hierarchyHashes(certs)); hh.count() }
    phase("0 config+route")      {
      cfg = mat(Proposals.routeGroups(
        Proposals.flagNonConformant(Proposals.configHashes(hh)),
        maxUniqueRatio = 1.0, maxEntropy = 99.0, minDominantPct = 0.0)); cfg.count() }
    phase("0 buildProposals")    {
      props = mat(Proposals.normalizeDateRanges(Proposals.buildProposals(cfg, certs)))
      props.count() }
    phase("0 splitConfigs")      {
      splits = mat(Proposals.splitConfigsVersioned(props, cfg, hh)); splits.count() }
    phase("0 hierarchyEntities") {
      val (versionsL, participantsL) = Proposals.hierarchyEntitiesVersioned(certs, mat)
      versions = mat(versionsL.drop("hierarchy_hash"))
      participants = mat(participantsL)
      versions.count() + participants.count() }
    val premiums = mat(Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("premium_id"), col("o_orderkey").as("cert_id"),
      concat(lit("G"), pmod(col("o_orderkey"), lit(3079))).as("group_id"),
      col("o_totalprice").as("amount"),
      date_add(to_date(col("o_orderdate")), 400).as("txn_date")))
    val calcCerts = mat(certs.groupBy(col("cert_id"))
      .agg(first(col("group_id")).as("group_id"),
        first(col("product_code")).as("product_code"),
        first(col("plan_code")).as("plan_code"))
      .withColumn("state", lit("TX"))
      .withColumn("group_size", lit(null).cast("int"))
      .withColumn("real_rate", lit(null).cast("double")))
    val rates = {
      import spark.implicits._
      (0 until 50).map(i => (s"SCHED$i", "*", "*",
        null.asInstanceOf[java.lang.Integer], null.asInstanceOf[java.lang.Integer],
        5.0 + (i % 10) * 0.5))
        .toDF("schedule_code", "product_code", "state", "size_from", "size_to", "rate")
    }
    val assignments = {
      import spark.implicits._
      Seq.empty[(String, String, Double, java.sql.Date, java.sql.Date)]
        .toDF("broker_id", "recipient_id", "assigned_pct", "eff_from", "eff_to")
    }
    val propsIn = mat(props.select(col("proposal_id"), col("group_id"),
      col("eff_from").cast("date").as("eff_from"), col("eff_to").cast("date").as("eff_to")))

    var e: DataFrame = null; var p: DataFrame = null; var s8: DataFrame = null
    var v: DataFrame = null; var x: DataFrame = null; var r: DataFrame = null
    var fin: DataFrame = null
    phase("1-2 enrich")          { e = mat(Calc.enrich(premiums, calcCerts)); e.count() }
    phase("3 resolveProposal")   { p = mat(Calc.resolveProposal(e, propsIn)); p.count() }
    phase("4 explodeSplits")     { s8 = mat(Calc.explodeSplits(p, splits, tagOrdinal = false)); s8.count() }
    phase("5 resolveHierVersion"){ v = mat(Calc.resolveHierarchyVersion(s8, versions)); v.count() }
    phase("6 explodeParticipants"){ x = mat(Calc.explodeParticipants(v, participants)); x.count() }
    phase("7 lookupRate")        { r = mat(Calc.lookupRate(x, rates,
      rowKey = Seq(col("premium_id"), col("proposal_id"), col("split_seq"),
        col("split_pct"), col("hierarchy_id"),
        col("version_id"), col("__pseq")))); r.count() }
    phase("8 compute+assign")    { fin = mat(Calc.applyAssignments(Calc.compute(r), assignments)); fin.count() }
    phase("gl projection")       { Calc.glEntries(fin).count() }
    spark.stop()
  }
}
