package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GenSourceSpec extends SparkSpec {

  private def gen(n: Long, slices: Int = 4) =
    spark.read.format("graft.sources.GenSource")
      .option("n", n).option("slices", slices).load()

  test("full scan generates exactly [0, n) with the declared parallelism") {
    val df = gen(1000, slices = 8)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 1000)
    val ids = df.agg(min("doc_id"), max("doc_id"), countDistinct("doc_id"))
      .head()
    assert(ids.getLong(0) == 0 && ids.getLong(1) == 999 && ids.getLong(2) == 1000)
  }

  test("doc_id range predicates are pushed into the generator") {
    val df = gen(100000, slices = 4)
      .filter(col("doc_id") >= 40000 && col("doc_id") < 40100)
    val plan = df.queryExecution.executedPlan.toString
    // the scan itself narrowed its range — not a 100k-row post-filter
    assert(plan.contains("range=[40000,40100)"), plan)
    assert(plan.contains("GreaterThanOrEqual(doc_id,40000)"), plan)
    assert(df.count() == 100)
  }

  test("equality pushdown narrows to a single row") {
    val df = gen(100000).filter(col("doc_id") === 77)
    assert(df.queryExecution.executedPlan.toString.contains("range=[77,78)"))
    assert(df.count() == 1)
  }

  test("non-id predicates stay residual and still filter correctly") {
    val df = gen(2000).filter(col("score") < 0.5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[0,2000)"), plan) // not narrowed
    // residual applied by Spark: every surviving row satisfies it
    assert(df.agg(max("score")).head().getDouble(0) < 0.5)
    assert(df.count() > 0 && df.count() < 2000)
  }

  test("column pruning reaches the scan") {
    val df = gen(500).select("source")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=source"), plan)
    assert(df.distinct().count() == 4)
  }

  test("derivation matches the documented md5 recipe") {
    val h = GenSource.md5Hex("gen-0")
    val (a, b, c) = GenSource.derive(0)
    assert(a == java.lang.Long.parseLong(h.substring(0, 8), 16))
    val row = gen(1).head()
    assert(row.getLong(0) == 0)
    assert(row.getString(1) == GenSource.sources((a % 4).toInt))
    assert(row.getString(2) == GenSource.langs((b % 5).toInt))
    assert(row.getInt(3) == 50 + (c % 951).toInt)
    assert(row.getDouble(4) == a.toDouble / 4294967296.0)
  }

  test("empty range after contradictory pushdown yields zero partitions") {
    val df = gen(1000).filter(col("doc_id") >= 900 && col("doc_id") < 100)
    assert(df.count() == 0)
  }
}
