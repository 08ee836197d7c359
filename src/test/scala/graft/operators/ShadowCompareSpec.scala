package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShadowCompareSpec extends SparkSpec {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame, entity: String) =
    df.filter(col("entity") === entity).collect().head

  test("identical variants reconcile to the all-zero verdict") {
    val a = Seq((1L, "x", 10), (2L, "y", 20), (2L, "y2", 21)).toDF("k", "v", "n")
    val b = Seq((2L, "y2", 21), (1L, "x", 10), (2L, "y", 20)).toDF("k", "v", "n")
    val r = row(ShadowCompare.report(Seq(
      ShadowCompare.Entity("e", a, b, Seq("k"), Seq("v", "n")))), "e")
    assert(r.getAs[Long]("a_count") == 3 && r.getAs[Long]("b_count") == 3)
    assert(r.getAs[Long]("a_only_keys") == 0 && r.getAs[Long]("b_only_keys") == 0)
    assert(r.getAs[Long]("mismatched_keys") == 0)
    assert(r.getAs[Boolean]("within_tol") && r.getAs[Boolean]("identical"))
  }

  test("detects missing keys, value drift and duplicate-multiplicity drift") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w"), (4L, "w"))
      .toDF("k", "v")
    val b = Seq((1L, "x"), (2L, "DIFFERENT"), (5L, "q"), (4L, "w"))
      .toDF("k", "v")
    val r = row(ShadowCompare.report(Seq(
      ShadowCompare.Entity("e", a, b, Seq("k"), Seq("v")))), "e")
    assert(r.getAs[Long]("a_count") == 5 && r.getAs[Long]("b_count") == 4)
    assert(r.getAs[Long]("a_only_keys") == 1)      // k=3
    assert(r.getAs[Long]("b_only_keys") == 1)      // k=5
    assert(r.getAs[Long]("mismatched_keys") == 2)  // k=2 value, k=4 multiplicity
    assert(r.getAs[Long]("diff") == 1)
    assert(r.getAs[Double]("pct_diff") == 25.0)
    assert(!r.getAs[Boolean]("within_tol") && !r.getAs[Boolean]("identical"))
  }

  test("count tolerance verdict follows the ±pct contract") {
    // 100 vs 103 rows on disjoint key spaces: 2.91% under the default 5%
    val a = spark.range(100).select(col("id").as("k"), lit("v").as("v"))
    val b = spark.range(103).select((col("id") + 1000).as("k"), lit("v").as("v"))
    val r = row(ShadowCompare.report(Seq(
      ShadowCompare.Entity("e", a, b, Seq("k"), Seq("v")))), "e")
    assert(r.getAs[Long]("diff") == -3)
    assert(r.getAs[Boolean]("within_tol"))         // |−2.9126| <= 5
    assert(!r.getAs[Boolean]("identical"))         // but NOT identical
    // and a tighter tolerance flips the verdict
    val tight = row(ShadowCompare.report(Seq(
      ShadowCompare.Entity("e", a, b, Seq("k"), Seq("v"))), tolerancePct = 2.0), "e")
    assert(!tight.getAs[Boolean]("within_tol"))
  }

  test("multiple entities report one row each, order-independent") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "x")).toDF("k", "v")
    val out = ShadowCompare.report(Seq(
      ShadowCompare.Entity("first", a, b, Seq("k"), Seq("v")),
      ShadowCompare.Entity("second", a, a, Seq("k"), Seq("v"))))
    assert(out.count() == 2)
    assert(out.select("entity").as[String].collect().toSet == Set("first", "second"))
  }
}
