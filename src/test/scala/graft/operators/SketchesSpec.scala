package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val df = (1L to 2000L).map(i => ("k" + (i % 37)))
    .toDF("k") // 37 keys, ~54 rows each

  test("count-min estimates never undercount and are exact without collisions") {
    val sk = Sketches.countMinSketch(df, col("k"), depth = 4, width = 512)
    val truth = df.groupBy(col("k")).agg(count(lit(1)).as("true_cnt"))
    val est = Sketches.countMinEstimate(sk, truth, col("k"), depth = 4, width = 512)
      .as[(String, Long, Long)].collect()
    assert(est.length == 37)
    est.foreach { case (_, t, e) => assert(e >= t) } // CM guarantee
    // 37 keys into 512 cells x 4 rows: min over rows is exact w.h.p. for
    // this fixed hash family (deterministic -> assert it outright)
    assert(est.forall { case (_, t, e) => e == t })
  }

  test("narrow sketch still upper-bounds under forced collisions") {
    val sk = Sketches.countMinSketch(df, col("k"), depth = 2, width = 8)
    val truth = df.groupBy(col("k")).agg(count(lit(1)).as("true_cnt"))
    val est = Sketches.countMinEstimate(sk, truth, col("k"), depth = 2, width = 8)
      .as[(String, Long, Long)].collect()
    assert(est.forall { case (_, t, e) => e >= t })
    assert(est.exists { case (_, t, e) => e > t }) // collisions must inflate
  }

  test("sketch size is bounded by depth x width regardless of input size") {
    val sk = Sketches.countMinSketch(df, col("k"), depth = 3, width = 16)
    assert(sk.count() <= 3 * 16)
    // total mass per row equals the input row count (mergeability invariant)
    val mass = sk.groupBy(col("__r")).agg(sum(col("cnt")).as("m"))
      .select(col("m")).as[Long].collect()
    assert(mass.forall(_ == 2000L))
  }

  test("unseen keys estimate to the colliding mass, never negative") {
    val sk = Sketches.countMinSketch(df, col("k"), depth = 4, width = 512)
    val unseen = Seq("zz1", "zz2").toDF("k")
    val est = Sketches.countMinEstimate(sk, unseen, col("k"), depth = 4, width = 512)
      .as[(String, Long)].collect()
    assert(est.forall(_._2 >= 0L))
  }

  test("joinSizeEstimate equals the exact join size when the grid is collision-free") {
    // 10 distinct keys into a 4x1024 grid: collisions are (vanishingly)
    // unlikely, so every row's inner product is exactly sum(fa*fb)
    val a = (1 to 10).flatMap(k => Seq.fill(k)(s"k$k")).toDF("k")   // fa(k_i) = i
    val b = (1 to 10).flatMap(k => Seq.fill(2)(s"k$k")).toDF("k")   // fb = 2
    val est = Sketches.joinSizeEstimate(a, col("k"), b, col("k"), 4, 1024)
      .as[Long].head()
    assert(est == (1 to 10).map(_ * 2).sum) // = 110
  }

  test("joinSizeEstimate never undercounts (collisions only add mass)") {
    val a = (1 to 500).map(i => s"a$i").toDF("k")
    val b = (1 to 500).map(i => s"a${i % 50}").toDF("k")
    val exact = a.join(b, Seq("k")).count()
    val est = Sketches.joinSizeEstimate(a, col("k"), b, col("k"), 3, 32)
      .as[Long].head()
    assert(est >= exact)
  }
}
