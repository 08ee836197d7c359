package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PhaSpec extends SparkSpec {
  import spark.implicits._

  test("PHA entities: fresh per-cert hierarchies for non-conformant splits, no dedup") {
    val routed = Seq((1L, true), (2L, false)).toDF("cert_id", "route_pha")
    val hh = Seq(
      (1L, 1, 60.0, Seq((1, "B1", "S1"), (2, "B2", "S1"))),
      (1L, 2, 30.0, Seq((1, "B3", "S1"))), // sums 90 -> nonconformant cert
      (2L, 1, 100.0, Seq((1, "B1", "S1"))),
    ).toDF("cert_id", "split_seq", "split_pct", "raw_tiers")
      .withColumn("tiers", expr(
        "transform(raw_tiers, t -> struct(t._1 as tier_level, t._2 as broker_id, t._3 as schedule_code))"))
    val got = Pha.phaEntities(routed, hh)
    val rows = got.select(col("pha_hierarchy_id"), col("version_id"), col("broker_id"))
      .as[(String, String, String)].collect().toSet
    assert(rows == Set(
      ("PHA-1-1", "PHA-1-1-V1", "B1"),
      ("PHA-1-1", "PHA-1-1-V1", "B2"),
      ("PHA-1-2", "PHA-1-2-V1", "B3")))
    assert(!got.select("cert_id").as[Long].collect().contains(2L)) // conformant untouched
  }

  test("state-rule cascade: rules x products x participants with equal distribution") {
    val versions = Seq("V1").toDF("version_id")
    val states = Seq(("V1", "TX"), ("V1", "CA")).toDF("version_id", "state")
    val products = Seq(("V1", "A"), ("V1", "B")).toDF("version_id", "product_code")
    val participants = Seq(("V1", "B1"), ("V1", "B2"), ("V1", "B3"))
      .toDF("version_id", "broker_id")
    val got = Pha.stateRuleCascade(versions, states, products, participants)
    assert(got.count() == 2 * 2 * 3) // states x products x participants
    val pcts = got.select(col("distribution_pct").cast("string")).distinct().as[String].collect()
    assert(pcts.toSeq == Seq("33.33")) // 100/3 at DECIMAL(5,2)
    val perSplit = got.groupBy(col("split_id")).count().select(col("count")).as[Long].collect()
    assert(perSplit.forall(_ == 3))
  }
}
