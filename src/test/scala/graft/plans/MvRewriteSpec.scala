package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** MV rewrite contracts: the rule must (1) produce identical results to
  * the base-table aggregate for every decomposable shape, (2) actually
  * swap the scan to the summary, and (3) refuse every non-decomposable
  * shape (distinct aggs, non-dim filters, expression group-bys). */
class MvRewriteSpec extends SparkSpec {

  private val baseDir = "/tmp/graft_mv_spec/base"
  private val mvDir = "/tmp/graft_mv_spec/summary"

  private def summaryRel(path: String): LogicalRelation =
    spark.read.parquet(path).queryExecution.analyzed
      .collectFirst { case r: LogicalRelation => r }.get

  private lazy val setup: MvDef = {
    import spark.implicits._
    MvRegistry.clear()
    val base = (1 to 4000).map { i =>
      (s"g${i % 7}", s"h${i % 3}", (i % 100).toDouble, i.toLong)
    }.toDF("dim_a", "dim_b", "m_x", "m_y")
    base.write.mode("overwrite").parquet(baseDir)
    spark.read.parquet(baseDir)
      .groupBy("dim_a", "dim_b")
      .agg(
        sum("m_x").as("sum_m_x"), min("m_x").as("min_m_x"),
        max("m_x").as("max_m_x"), sum("m_y").as("sum_m_y"),
        count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(mvDir)
    val d = MvDef(
      baseTag = "graft_mv_spec/base",
      dims = Set("dim_a", "dim_b"),
      sumOf = Map("m_x" -> "sum_m_x", "m_y" -> "sum_m_y"),
      minOf = Map("m_x" -> "min_m_x"),
      maxOf = Map("m_x" -> "max_m_x"),
      countCol = "cnt",
      summary = summaryRel(mvDir))
    MvRegistry.register(d)
    d
  }

  private def scansOf(df: DataFrame): String =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.mkString(",")
        case o => o.toString
      }
    }.mkString("\n")

  private def assertRewritten(df: DataFrame): Unit = {
    val s = scansOf(df)
    assert(s.contains("summary"), s"expected summary scan, got:\n$s")
    assert(!s.contains("base"), s"expected base scan replaced, got:\n$s")
  }

  private def assertNotRewritten(df: DataFrame): Unit = {
    val s = scansOf(df)
    assert(s.contains("base") && !s.contains("summary"),
      s"expected base scan untouched, got:\n$s")
  }

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("sum/count/min/max/avg over dims rewrite and match the base result") {
    setup
    val base = spark.read.parquet(baseDir)
    def q(df: DataFrame): DataFrame = df
      .groupBy("dim_a")
      .agg(sum("m_x").as("sx"), count(lit(1)).as("n"),
        min("m_x").as("mn"), max("m_x").as("mx"),
        avg("m_x").as("av"), sum("m_y").as("sy"))
    val rewritten = q(base)
    assertRewritten(rewritten)
    // expected side: compute from the base with the rule unable to fire
    // (register cleared) — reuse the same frame shape
    MvRegistry.clear()
    val expected = q(spark.read.parquet(baseDir))
    assertNotRewritten(expected)
    assert(sorted(rewritten) == sorted(expected))
    MvRegistry.register(setup)
  }

  test("dim-only filters rewrite onto the summary; results match") {
    setup
    val base = spark.read.parquet(baseDir)
    def q(df: DataFrame): DataFrame = df
      .filter(col("dim_b") =!= "h1")
      .groupBy("dim_a", "dim_b")
      .agg(sum("m_y").as("sy"), count(lit(1)).as("n"))
    val r = q(base)
    assertRewritten(r)
    MvRegistry.clear()
    val e = q(spark.read.parquet(baseDir))
    assert(sorted(r) == sorted(e))
    MvRegistry.register(setup)
  }

  test("global aggregate (empty GROUP BY) rewrites") {
    setup
    val base = spark.read.parquet(baseDir)
    val r = base.agg(sum("m_x").as("sx"), count(lit(1)).as("n"))
    assertRewritten(r)
    assert(r.collect().head.toString ==
      s"[${(1 to 4000).map(i => (i % 100).toDouble).sum},4000]")
  }

  test("non-dim filter, distinct agg, unregistered measure all refuse") {
    setup
    val base = spark.read.parquet(baseDir)
    assertNotRewritten(
      base.filter(col("m_x") > 5).groupBy("dim_a").agg(sum("m_x")))
    assertNotRewritten(
      base.groupBy("dim_a").agg(countDistinct("m_y")))
    // unregistered measure
    assertNotRewritten(
      base.groupBy("dim_a").agg(min("m_y")))
  }

  test("expression group-by (coarser than summary grain) rewrites exactly") {
    setup
    def q(df: DataFrame): DataFrame = df
      .groupBy(upper(col("dim_a")).as("ga"))
      .agg(sum("m_x").as("sx"), round(avg("m_x"), 6).as("av"))
    val r = q(spark.read.parquet(baseDir))
    assertRewritten(r)
    MvRegistry.clear()
    val e = q(spark.read.parquet(baseDir))
    assert(sorted(r) == sorted(e))
    MvRegistry.register(setup)
  }

  test("rewritten aggregate composes under downstream operators") {
    setup
    val base = spark.read.parquet(baseDir)
    val r = base.groupBy("dim_a").agg(sum("m_y").as("sy"))
      .filter(col("sy") > 0).orderBy("dim_a").limit(3)
    assertRewritten(r)
    assert(r.count() == 3)
  }
}
