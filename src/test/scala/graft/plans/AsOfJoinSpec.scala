package graft.plans

import graft.SparkSpec
import graft.operators.{AsOfNative, Joins}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

class AsOfJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def rates = Seq(
    // key, from_ts, rate
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)).toDF("rk", "from_ts", "rate")

  private def facts = Seq(
    ("A", 5L), ("A", 10L), ("A", 25L), ("A", 99L),
    ("B", 15L), ("B", 14L), ("C", 50L)).toDF("k", "ts")

  test("inner as-of: latest version at or before ts, per key") {
    val out = AsOfNative.asOfJoin(facts, rates, Seq("k" -> "rk"), "ts", "from_ts")
      .select($"k", $"ts", $"rate").as[(String, Long, Double)].collect().toSet
    assert(out == Set(
      ("A", 10L, 1.0), // inclusive bound
      ("A", 25L, 2.0),
      ("A", 99L, 3.0),
      ("B", 15L, 9.0)))
    // dropped: A@5 (before first version), B@14, C@50 (no key)
  }

  test("left_outer keeps unmatched facts with null payload; strict excludes the boundary") {
    val out = AsOfNative.asOfJoin(facts, rates, Seq("k" -> "rk"), "ts", "from_ts",
        joinType = "left_outer", strict = true)
      .select($"k", $"ts", $"rate").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))
      .toSet
    assert(out == Set(
      ("A", 5L, null), ("A", 10L, null), // strict: from_ts=10 no longer covers ts=10
      ("A", 25L, 2.0), ("A", 99L, 3.0),
      ("B", 15L, null), ("B", 14L, null), ("C", 50L, null)))
  }

  test("self as-of on one scan resolves (fresh ids) and matches the composed form") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate")
      // unique-per-key time: day index * 2^20 + orderkey keeps ties apart
      .withColumn("t", datediff($"o_orderdate", lit("1990-01-01")).cast("long") * 1048576L + $"o_orderkey")
    val dim = orders.select($"o_custkey".as("c"), $"t".as("rt"), $"o_orderkey".as("prev_orderkey"))

    val native = AsOfNative.asOfJoin(orders, dim, Seq("o_custkey" -> "c"), "t", "rt", strict = true)
      .select($"o_orderkey", $"prev_orderkey")

    val composed = Joins.asOfJoin(
        orders, dim, orders("o_custkey") === dim("c"),
        orders("t"), dim("rt"), to = lit(null).cast("long"), strictUpper = false)
      .filter($"rt" < $"t")
    val top1 = Joins.top1PerGroup(composed, Seq($"o_orderkey"), Seq($"rt".desc))
      .select($"o_orderkey", $"prev_orderkey")

    assert(native.exceptAll(top1).isEmpty && top1.exceptAll(native).isEmpty)
    assert(native.count() > 0)
  }

  test("plan: AsOfJoinExec with one exchange+sort per side, no window") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .withColumn("t", datediff($"o_orderdate", lit("1990-01-01")).cast("long") * 1048576L + $"o_orderkey")
    val dim = orders.select($"o_custkey".as("c"), $"t".as("rt"), $"o_orderkey".as("prev_orderkey"))
    val df = AsOfNative.asOfJoin(orders, dim, Seq("o_custkey" -> "c"), "t", "rt", strict = true)
    df.collect() // finalize any adaptive plan
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) { case e: AsOfJoinExec => e }.nonEmpty,
      s"expected AsOfJoinExec in:\n$plan")
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(exchanges.size <= 2, s"expected <=2 shuffles, got ${exchanges.size}:\n$plan")
    val windows = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, s"as-of exec must not plan a window:\n$plan")
  }

  test("empty right side: inner drops all, left_outer null-extends all") {
    val empty = rates.filter(lit(false))
    assert(AsOfNative.asOfJoin(facts, empty, Seq("k" -> "rk"), "ts", "from_ts").count() == 0)
    val outer = AsOfNative.asOfJoin(facts, empty, Seq("k" -> "rk"), "ts", "from_ts", "left_outer")
    assert(outer.count() == facts.count() && outer.filter($"rate".isNotNull).count() == 0)
  }
}
