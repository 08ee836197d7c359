package graft.sql

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class RewriteHofCosineSpec extends SparkSpec {
  import spark.implicits._

  // RDD-backed (not a LocalRelation) so the optimizer cannot constant-fold
  // the projection away before the plan assertion sees it
  private def vecs = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)),
    (2L, Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0)),
    (3L, Array(0.5, -0.5, 2.0), Array(-1.0, 4.0, 0.25)))))
    .toDF("id", "a", "b")

  test("HOF cosine pattern is rewritten to the native expression") {
    val df = vecs.select(VectorFunctions.cosine(col("a"), col("b")).as("cos"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosine_sim"), optimized)
    assert(!optimized.contains("aggregate("), optimized)
  }

  test("rewritten results are bit-identical to both forms") {
    val hof = vecs.select(col("id"),
      VectorFunctions.cosine(col("a"), col("b")).as("cos"))
      .as[(Long, Double)].collect().toMap
    val native = vecs.select(col("id"),
      VectorFunctions.cosineNative(col("a"), col("b")).as("cos"))
      .as[(Long, Double)].collect().toMap
    assert(hof == native) // exact equality, not tolerance
    assert(hof(2L) == 0.0) // zero-norm guard preserved
  }

  test("non-cosine aggregates are untouched") {
    val df = vecs.select(
      aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x).as("ssq"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("cosine_sim"), optimized)
    assert(df.as[Double].collect().head == 14.0)
  }
}
