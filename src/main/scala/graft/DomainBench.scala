package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.domain._

/** End-to-end commissions-domain throughput bench, comparable to
  * BASELINE.md: the reference processes 400,688 cert rows in 238.8 s
  * end-to-end (~1,700 rows/s) / 2.0 s in-memory transform (~200 K rows/s)
  * on a single Node process.
  *
  * Synthesizes reference-shaped certificate/premium inputs
  * deterministically from the TPC-H-ish testdata (lineitem rows become
  * (cert x split) rows; orders become premiums), then runs the full
  * inference + calculation lineage: hierarchy/config hashing ->
  * non-conformance + entropy routing -> proposal construction ->
  * split/hierarchy derivation -> premium transactions -> 8-stage calc ->
  * GL + traceability. Prints one JSON line.
  */
object DomainBench {

  def synthCertificates(spark: SparkSession, sfDir: String): DataFrame =
    synthCertificatesFrom(Tables.lineitem(spark, sfDir))

  /** Synth from an arbitrary lineitem-shaped frame (callers may pre-slice
    * by whole order keys — the per-order windows stay consistent). */
  def synthCertificatesFrom(li: DataFrame): DataFrame = {
    // split percents: equal shares with the remainder on the last split so
    // every certificate sums to exactly 100.00 (conformant by construction
    // except a deterministic 2% carve-out to exercise the PHA route).
    // l_linenumber is NOT unique per order in the synthetic data; the
    // full (linenumber, suppkey, partkey) tiebreak pins which row carries
    // the remainder split percent (it IS unique per order — checked at
    // sf0.01 and sf0.1).
    //
    // Default path: hash-agg (cnt + max(struct(tiebreak))) + equi join
    // back — two hash shuffles, NO sort; the row equal to the per-order
    // max struct is the remainder carrier, bit-equal to rn==cnt under a
    // unique tiebreak. Measured at sf0.1 vs the shared-sort WindowExec
    // twin (SPARK_GRAFT_SYNTH=window): see NOTES round 10. At 100 TB the
    // agg form also partial-aggregates map-side, where a window must
    // shuffle every row to its order's partition and sort it.
    val withCnt =
      if (sys.env.get("SPARK_GRAFT_SYNTH").contains("window")) {
        val ordered = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_suppkey"), col("l_partkey"))
        li.withColumn("cnt", count(lit(1)).over(
            ordered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("rn", row_number().over(ordered))
          .withColumn("base_pct", floor(lit(10000) / col("cnt")) / 100.0)
          .withColumn("split_pct",
            when(col("rn") < col("cnt"), col("base_pct"))
              .otherwise(round(lit(100.0) - col("base_pct") * (col("cnt") - 1), 2)))
      } else {
        val tiebreak = struct(col("l_linenumber"), col("l_suppkey"), col("l_partkey"))
        val perOrder = li.groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("cnt"), max(tiebreak).as("__last"))
        li.join(perOrder, Seq("l_orderkey"))
          .withColumn("base_pct", floor(lit(10000) / col("cnt")) / 100.0)
          .withColumn("split_pct",
            when(tiebreak =!= col("__last"), col("base_pct"))
              .otherwise(round(lit(100.0) - col("base_pct") * (col("cnt") - 1), 2)))
      }
    withCnt.select(
      col("l_orderkey").as("cert_id"),
      concat(lit("G"), pmod(col("l_orderkey"), lit(3079))).as("group_id"),
      col("l_linenumber").as("split_seq"),
      when(pmod(col("l_orderkey"), lit(50)) === 0, col("split_pct") + 1.0)
        .otherwise(col("split_pct")).as("split_pct"), // ~2% nonconformant
      lit(1).as("tier_level"),
      concat(lit("P"), col("l_suppkey")).as("broker_id"),
      concat(lit("SCHED"), pmod(col("l_suppkey"), lit(50))).as("schedule_code"),
      concat(lit("P"), col("l_suppkey")).as("paid_broker_id"),
      col("l_returnflag").as("product_code"),
      lit("*").as("plan_code"),
      to_date(col("l_shipdate")).as("eff_date"),
      col("l_partkey"))
  }

  /** The pipeline as a single composable frame (GL entries), for the
    * bench/verify query surface. The fan-in frames (hashes feed configs +
    * splits + hierarchy dedup; final feeds both GL branches) are
    * materialized eagerly so they compute once. Default is
    * `localCheckpoint` (right for a single JVM: truncates lineage, no
    * recompute); on a real cluster set `SPARK_GRAFT_MAT=persist` —
    * localCheckpoint blocks are lost on executor failure and pin executor
    * storage, while an eagerly-counted persist(MEMORY_AND_DISK) survives
    * recompute from lineage. */
  def glPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val fin = graft.Mat(Calc.run(glInputs(spark, sfDir)))
    Calc.glEntries(fin)
  }

  /** The flagship's full input set (synth certificates -> hashing ->
    * routing -> proposals -> versioned hierarchies + premiums/rates) as
    * a reusable [[Calc.CalcInputs]] — the substrate for both the one-shot
    * flagship run and the incremental (base + delta batch) maintenance
    * twin, which must share EXACT inputs for the batch-identity oracle
    * to hold. */
  def glInputs(spark: SparkSession, sfDir: String): Calc.CalcInputs = {
    def mat(df: DataFrame): DataFrame = graft.Mat(df)
    val certs = mat(synthCertificates(spark, sfDir))
    // Fused one-shuffle hash build is the DEFAULT (bit-equal to the
    // two-phase build — ProposalsSpec; measured 9.3-9.6 s vs 10.7-11.2 s
    // flagship at sf0.1): per-split rows explode back out of the fused
    // frame instead of paying a second aggregate's shuffle.
    // SPARK_GRAFT_FUSED=0 restores the two-phase build for comparison.
    val (hh, cfg) =
      if (!sys.env.get("SPARK_GRAFT_FUSED").contains("0")) {
        val fused = mat(Proposals.fusedHashes(certs))
        (Proposals.fusedSplitRows(fused),
          mat(Proposals.routeGroups(
            Proposals.flagNonConformant(fused.select(col("cert_id"),
              col("group_id"), col("config_hash"), col("total_split_pct"),
              col("n_splits"))),
            maxUniqueRatio = 1.0, maxEntropy = 99.0, minDominantPct = 0.0)))
      } else {
        val h = mat(Proposals.hierarchyHashes(certs))
        (h, mat(Proposals.routeGroups(
          Proposals.flagNonConformant(Proposals.configHashes(h)),
          maxUniqueRatio = 1.0, maxEntropy = 99.0, minDominantPct = 0.0)))
      }
    val props = mat(Proposals.normalizeDateRanges(Proposals.buildProposals(cfg, certs)))
    // multi-version flow: splits reference the business slot (group x seq)
    // and the calc's as-of join resolves the slot's version island active
    // at the transaction date (07-deprecated-hierarchies.sql semantics)
    // splits and participants feed exactly ONE consumer each, so they
    // stay lazy; the islands computation inside hierarchyEntitiesVersioned
    // is materialized via the passed-in mat (it feeds both outputs)
    val splits = Proposals.splitConfigsVersioned(props, cfg, hh)
    val (versions, participants) = Proposals.hierarchyEntitiesVersioned(certs, mat)
    val premiums = Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("premium_id"), col("o_orderkey").as("cert_id"),
      concat(lit("G"), pmod(col("o_orderkey"), lit(3079))).as("group_id"),
      col("o_totalprice").as("amount"),
      date_add(to_date(col("o_orderdate")), 400).as("txn_date"))
    val calcCerts = certs.groupBy(col("cert_id"))
      .agg(first(col("group_id")).as("group_id"), first(col("product_code")).as("product_code"),
        first(col("plan_code")).as("plan_code"))
      .withColumn("state", lit("TX"))
      .withColumn("group_size", lit(null).cast("int"))
      .withColumn("real_rate", lit(null).cast("double"))
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
    Calc.CalcInputs(
      premiums, calcCerts,
      props.select(col("proposal_id"), col("group_id"),
        col("eff_from").cast("date").as("eff_from"), col("eff_to").cast("date").as("eff_to")),
      splits, versions.drop("hierarchy_hash"), participants, rates, assignments)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-domain-bench")
    val t0 = System.nanoTime()

    // persist the fan-in frames: certs feeds hashing + calc-cert derivation,
    // hierarchy hashes feed configs + splits + hierarchy dedup, configs feed
    // proposals + splits — without persistence the synth lineage (two windows
    // over lineitem) re-executes once per consumer
    val certs = synthCertificates(spark, sfDir).persist()
    val nCertRows = certs.count() // input scale, forces the synth

    val t1 = System.nanoTime()
    // fused one-shuffle hash build, same as glPipeline's default
    val fused = Proposals.fusedHashes(certs).persist()
    val hh = Proposals.fusedSplitRows(fused)
    // synthetic configs are near-unique per cert, so entropy routing is
    // relaxed here (it would route almost every group); the 2% split-sum
    // carve-out still exercises the non-conformance path
    val cfg = Proposals.routeGroups(
      Proposals.flagNonConformant(fused.select(col("cert_id"), col("group_id"),
        col("config_hash"), col("total_split_pct"), col("n_splits"))),
      maxUniqueRatio = 1.0, maxEntropy = 99.0, minDominantPct = 0.0).persist()
    val props = Proposals.normalizeDateRanges(Proposals.buildProposals(cfg, certs))
      .persist()
    val splits = Proposals.splitConfigsVersioned(props, cfg, hh)
    val (versions, participants) = Proposals.hierarchyEntitiesVersioned(certs)
    def phase[T](name: String)(f: => T): T = {
      val s = System.nanoTime(); val r = f
      System.err.println(f"[phase] $name: ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    phase("cache fused hashes")(fused.count())
    phase("cache cfg")(cfg.count())
    val nProposals = phase("proposals")(props.count())

    val premiums = Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("premium_id"), col("o_orderkey").as("cert_id"),
      concat(lit("G"), pmod(col("o_orderkey"), lit(3079))).as("group_id"),
      col("o_totalprice").as("amount"),
      date_add(to_date(col("o_orderdate")), 400).as("txn_date"))
    val calcCerts = certs.groupBy(col("cert_id"))
      .agg(first(col("group_id")).as("group_id"), first(col("product_code")).as("product_code"),
        first(col("plan_code")).as("plan_code"))
      .withColumn("state", lit("TX"))
      .withColumn("group_size", lit(null).cast("int"))
      .withColumn("real_rate", lit(null).cast("double"))
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
    val fin = Calc.run(Calc.CalcInputs(
      premiums, calcCerts,
      props.select(col("proposal_id"), col("group_id"),
        col("eff_from").cast("date").as("eff_from"), col("eff_to").cast("date").as("eff_to")),
      splits, versions, participants, rates, assignments)).persist()
    phase("splits")(splits.persist().count())
    phase("hierarchy entities")(versions.persist().count() + participants.persist().count())
    val nGl = phase("calc+gl")(Calc.glEntries(fin).count())
    val nTraced = phase("traceability")(Calc.traceability(fin).count())
    // the typed per-group state machine at scale: consolidate the built
    // proposals (3,079 groups) through flatMapGroups
    val nConsolidated = phase("consolidation")(
      Consolidate.consolidate(props.select(
        col("group_id"), col("proposal_id"),
        col("config_hash").as("config_md5"),
        col("eff_from").cast("string").as("eff_from"),
        col("eff_to").cast("string").as("eff_to"),
        col("product_codes"), col("plan_codes"))).count())
    // the reference's >= 95% certificate-resolution pass bar, at scale
    val vSummary = phase("resolution validation")(
      ResolutionValidator.summarize(ResolutionValidator.validate(
        certs, cfg,
        props.select(col("group_id"), col("config_hash"), col("proposal_id")),
        splits, versions, participants, sampleMod = 20)))
    val secs = (System.nanoTime() - t1) / 1e9
    val total = (System.nanoTime() - t0) / 1e9
    val rps = (nCertRows / secs).toLong
    println(s"""{"metric":"domain_e2e","value":$secs,"unit":"sec","cert_rows":$nCertRows,""" +
      s""""proposals":$nProposals,"gl_entries":$nGl,"premiums_traced":$nTraced,""" +
      s""""rows_per_sec":$rps,"consolidated":$nConsolidated,""" +
      s""""validation_sampled":${vSummary.sampled},""" +
      s""""validation_pass_rate":${vSummary.passRate},""" +
      s""""total_incl_synth":$total,"sf":"$sfDir"}""")
    spark.stop()
  }
}
