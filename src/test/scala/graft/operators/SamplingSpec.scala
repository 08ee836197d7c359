package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSample is deterministic and close to the nominal rate") {
    val df = (1L to 10000L).toDF("id")
    val a = Sampling.hashSample(df, col("id"), 0.3).select(col("id")).as[Long].collect().toSet
    val b = Sampling.hashSample(df, col("id"), 0.3).select(col("id")).as[Long].collect().toSet
    assert(a == b) // pure function of id: identical across runs
    assert(math.abs(a.size / 10000.0 - 0.3) < 0.02)
    // a lower rate's sample NESTS inside a higher rate's (same bucket fn)
    val c = Sampling.hashSample(df, col("id"), 0.1).select(col("id")).as[Long].collect().toSet
    assert(c.subsetOf(a))
  }

  test("different salts draw different samples") {
    val df = (1L to 5000L).toDF("id")
    val a = Sampling.hashSample(df, col("id"), 0.5, salt = "s1")
      .select(col("id")).as[Long].collect().toSet
    val b = Sampling.hashSample(df, col("id"), 0.5, salt = "s2")
      .select(col("id")).as[Long].collect().toSet
    assert(a != b)
    assert(math.abs((a intersect b).size / 5000.0 - 0.25) < 0.03) // independent draws
  }

  test("stratifiedSample applies per-stratum rates and drops unknown strata") {
    val df = (1L to 9000L).map(i => (i, Seq("hi", "mid", "skip")((i % 3).toInt)))
      .toDF("id", "grp")
    val rates = Seq(("hi", 1.0), ("mid", 0.2)).toDF("stratum", "rate")
    val got = Sampling.stratifiedSample(df, col("grp"), col("id"), rates)
      .groupBy(col("grp")).count().as[(String, Long)].collect().toMap
    assert(got("hi") == 3000L)                       // rate 1.0 keeps all
    assert(math.abs(got("mid") / 3000.0 - 0.2) < 0.03)
    assert(!got.contains("skip"))                    // no configured rate -> dropped
  }

  test("groupSample keeps at most k rows per group, deterministically") {
    val df = (1L to 1000L).map(i => (i, (i % 7).toString)).toDF("id", "grp")
    val a = Sampling.groupSample(df, Seq(col("grp")), col("id"), k = 5)
    val sizes = a.groupBy(col("grp")).count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == 5L) && sizes.size == 7)
    val b = Sampling.groupSample(df, Seq(col("grp")), col("id"), k = 5)
    assert(a.select(col("id")).as[Long].collect().toSet ==
      b.select(col("id")).as[Long].collect().toSet)
  }
}
