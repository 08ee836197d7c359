package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink breadth (S1/S6): every format the engine reads/writes
  * round-trips losslessly. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Tables.customer(spark, sf001)
    .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"graft_fmt_$fmt").toString
    base.write.mode("overwrite").option("header", "true").format(fmt).save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true")
      .load(dir)
      .select(col("c_custkey").cast("long"), col("c_name"), col("c_acctbal").cast("double"))
    val a = base.select(col("c_custkey").cast("long"), col("c_name"),
      col("c_acctbal").cast("double")).as[(Long, String, Double)].collect().toSet
    val b = back.as[(Long, String, Double)].collect().toSet
    assert(a == b, s"$fmt round-trip lost data")
  }

  test("parquet round-trip")(roundTrip("parquet"))
  test("orc round-trip")(roundTrip("orc"))
  test("json round-trip")(roundTrip("json"))
  test("csv round-trip")(roundTrip("csv"))

  test("partitioned parquet sink: layout prunes partitions at read time") {
    val dir = Files.createTempDirectory("graft_fmt_part").toString
    val src = Tables.customer(spark, sf001)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    src.write.mode("overwrite").partitionBy("c_mktsegment").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("c_mktsegment") === "BUILDING")
    // the partition filter must be applied at planning (directory pruning),
    // NOT as a data filter after reading every file
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("c_mktsegment"), plan)
    val expected = src.filter(col("c_mktsegment") === "BUILDING").count()
    assert(back.count() == expected && expected > 0)
  }

  test("dynamic partition overwrite replaces only the touched partition") {
    val dir = Files.createTempDirectory("graft_fmt_dpo").toString
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((1L, "A", "2024-01"), (2L, "B", "2024-02"))
        .toDF("id", "v", "month")
        .write.mode("overwrite").partitionBy("month").parquet(dir)
      // overwrite ONLY 2024-02; 2024-01 must survive (the idempotent
      // re-run pattern for a partitioned bulk sink)
      Seq((3L, "B2", "2024-02")).toDF("id", "v", "month")
        .write.mode("overwrite").partitionBy("month").parquet(dir)
      val got = spark.read.parquet(dir).select(col("id"), col("v"), col("month"))
        .as[(Long, String, String)].collect().toSet
      assert(got == Set((1L, "A", "2024-01"), (3L, "B2", "2024-02")), got)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
