package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def steps = Seq(
    Pipeline.Step("load", Nil, Seq("raw"),
      (s, _) => Map("raw" -> Seq(1, 2, 3).toDF("v"))),
    Pipeline.Step("double", Seq("raw"), Seq("doubled"),
      (_, ctx) => Map("doubled" -> ctx("raw").withColumn("v", col("v") * 2))),
    Pipeline.Step("sum", Seq("doubled"), Seq("total"),
      (_, ctx) => Map("total" -> ctx("doubled").agg(sum(col("v")).as("t")))),
  )

  test("ordered run produces the DAG outputs with a ledger") {
    val r = new Pipeline.Runner(spark, steps).run()
    assert(r.frames("total").as[Long].collect().head == 12L)
    assert(r.runLedger.map(_.status).forall(_ == Pipeline.Completed))
  }

  test("resume: pre-seeded outputs are skipped") {
    val r = new Pipeline.Runner(spark, steps)
      .withInput("raw", Seq(10).toDF("v"))
      .run()
    assert(r.runLedger.find(_.step == "load").get.status == Pipeline.Skipped)
    assert(r.frames("total").as[Long].collect().head == 20L)
  }

  test("missing input fails fast with a diagnostic") {
    val bad = Seq(Pipeline.Step("s", Seq("nope"), Seq("out"), (_, _) => Map.empty))
    val e = intercept[IllegalStateException] {
      new Pipeline.Runner(spark, bad).run()
    }
    assert(e.getMessage.contains("missing inputs"))
  }

  test("debug levers: limit caps load steps, groups filters the downstream DAG") {
    val domainSteps = Seq(
      Pipeline.Step("load", Nil, Seq("certs"),
        (s, _) => Map("certs" -> Seq(
          (1L, "G1"), (2L, "G1"), (3L, "G2"), (4L, "G3"))
          .toDF("cert_id", "group_id"))),
      Pipeline.Step("derive", Seq("certs"), Seq("per_group"),
        (_, ctx) => Map("per_group" ->
          ctx("certs").groupBy(col("group_id")).agg(count(lit(1)).as("n")))))
    val limited = new Pipeline.Runner(spark, domainSteps,
      Pipeline.Debug(limit = Some(2))).run()
    assert(limited.frames("certs").count() == 2)
    val sliced = new Pipeline.Runner(spark, domainSteps,
      Pipeline.Debug(groups = Set("G1"))).run()
    assert(sliced.frames("certs").count() == 2) // only G1 certs survive the load
    val got = sliced.frames("per_group").as[(String, Long)].collect().toMap
    assert(got == Map("G1" -> 2L)) // the whole downstream DAG ran on the slice
  }

  test("materializeDir leaves every intermediate on disk; downstream reads the copy") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mat").toString
    val r = new Pipeline.Runner(spark, steps,
      Pipeline.Debug(materializeDir = Some(dir))).run()
    assert(r.frames("total").as[Long].collect().head == 12L)
    for (f <- Seq("load__raw", "double__doubled", "sum__total"))
      assert(new java.io.File(s"$dir/$f").isDirectory, f)
    // the context frame is the parquet read-back, inspectable after a crash
    assert(spark.read.parquet(s"$dir/double__doubled").as[Int].collect().sorted
      sameElements Array(2, 4, 6))
  }

  test("skip set records Skipped and downstream failure is diagnosed (failFast=false)") {
    val r = new Pipeline.Runner(spark, steps).run(skip = Set("load"), failFast = false)
    assert(r.runLedger.find(_.step == "load").get.status == Pipeline.Skipped)
    assert(r.runLedger.find(_.step == "double").get.status.isInstanceOf[Pipeline.Failed])
  }
}
