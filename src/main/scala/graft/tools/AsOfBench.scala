package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.{AsOfNative, Joins}

/** A/B: native sort-merge as-of exec vs the composed built-in form
  * (equi join + range residual + rank-1 window) on the same
  * previous-order-per-order task.
  *
  * Run with the same java -cp + --add-opens invocation as
  * tools/run_verify.sh, main class graft.tools.AsOfBench,
  * SPARK_GRAFT_SF_DIR selecting the scale.
  */
object AsOfBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-asof-bench")
    def orders = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"),
      (datediff(col("o_orderdate").cast("date"), lit("1990-01-01").cast("date")).cast("long") * 1048576L
        + col("o_orderkey")).as("t"))

    def native() = {
      val o = orders
      val dim = o.select(col("o_custkey").as("c"), col("t").as("rt"),
        col("o_orderkey").as("prev_orderkey"))
      AsOfNative.asOfJoin(o, dim, Seq("o_custkey" -> "c"), "t", "rt", "left_outer", strict = true)
        .select(col("o_orderkey"), col("prev_orderkey"))
    }
    def composed() = {
      val o = orders
      val dim = o.select(col("o_custkey").as("c"), col("t").as("rt"),
        col("o_orderkey").as("prev_orderkey"))
      val j = o.join(dim, o("o_custkey") === dim("c") && dim("rt") < o("t"), "left")
      Joins.top1PerGroup(j, Seq(col("o_orderkey")), Seq(col("rt").desc_nulls_last))
        .select(col("o_orderkey"), col("prev_orderkey"))
    }

    def time(tag: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-10s min=${secs.min}%.3f s  runs=${secs.map(s => f"$s%.3f").mkString(",")}")
    }
    spark.range(1000).selectExpr("sum(id)").collect() // warm
    time("native", () => native())
    time("composed", () => composed())
    spark.stop()
  }
}
