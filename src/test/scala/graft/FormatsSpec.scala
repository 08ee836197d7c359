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
}
