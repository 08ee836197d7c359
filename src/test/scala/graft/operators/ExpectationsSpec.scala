package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  private def byName(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Boolean)] =
    df.collect().map(r => r.getAs[String]("check_name") ->
      (r.getAs[Long]("violations"), r.getAs[Boolean]("pass"))).toMap

  test("row-level checks count false AND null as violations") {
    val df = Seq(
      (Some(1), Some("A"), Some(5.0)),
      (None, Some("B"), Some(11.0)),   // null id, range violation
      (Some(3), None, Some(-1.0)),     // null cat (set violation), range violation
      (Some(4), Some("Z"), None)       // set violation, null value (range violation)
    ).toDF("id", "cat", "v")
    val out = byName(Expectations.run(df, Seq(
      notNull("id_nn", "id"),
      inSet("cat_dom", "cat", Seq("A", "B")),
      inRange("v_rng", "v", 0.0, 10.0))))
    assert(out("id_nn") == (1L, false))
    assert(out("cat_dom") == (2L, false))
    assert(out("v_rng") == (3L, false))
  }

  test("row-level suite compiles to a single aggregate pass") {
    val df = graft.Tables.lineitem(spark, sf001)
    val out = Expectations.run(df, Seq(
      notNull("a", "l_orderkey"), inRange("b", "l_discount", 0, 1),
      inSet("c", "l_returnflag", Seq("A", "N", "R"))))
    val scans = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 scan for 3 row checks, got $scans")
  }

  test("unique counts surplus rows beyond the first per key") {
    val df = Seq(1, 1, 1, 2, 3, 3).toDF("k")
    val out = byName(Expectations.run(df, Seq(Unique("k_uniq", Seq("k")))))
    assert(out("k_uniq") == (3L, false)) // 2 surplus of key 1 + 1 of key 3
  }

  test("unique passes with zero violations on a unique key") {
    val df = Seq(1, 2, 3).toDF("k")
    assert(byName(Expectations.run(df, Seq(Unique("u", Seq("k")))))("u") == (0L, true))
  }

  test("referential integrity: null FKs pass, dangling FKs violate") {
    val fact = Seq(Some(1), Some(2), None, Some(9)).toDF("fk")
    val dim = Seq(1, 2, 3).toDF("pk")
    val out = byName(Expectations.run(fact, Seq(
      RefIntegrity("fk_ref", Seq("fk"), dim, Seq("pk")))))
    assert(out("fk_ref") == (1L, false)) // only 9 dangles; null passes
  }

  test("mixed suite emits one row per check with stable names") {
    val df = Seq((1, "A"), (2, "B")).toDF("id", "cat")
    val dim = Seq("A", "B").toDF("cat")
    val out = Expectations.run(df, Seq(
      notNull("nn", "id"), Unique("uq", Seq("id")),
      RefIntegrity("rf", Seq("cat"), dim, Seq("cat"))))
    assert(out.columns.toSeq == Seq("check_name", "kind", "violations", "pass"))
    assert(out.count() == 3)
    assert(out.filter(!col("pass")).count() == 0)
  }
}
