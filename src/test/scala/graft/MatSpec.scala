package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materializer contracts across the three modes — above all the r13
  * persist-mode fix: an iterative operator that Mats every round must
  * keep its catalyst plan BOUNDED in rounds (pre-fix, persist nested
  * each round's whole plan inside the next; 30-round compositions blew
  * the heap during analysis at sf0.001 — data had nothing to do with it). */
class MatSpec extends SparkSpec {
  import spark.implicits._

  private def iterate(rounds: Int): (DataFrame, Seq[Int]) = {
    var df = (1 to 64).toDF("v")
    val sizes = (1 to rounds).map { _ =>
      df = Mat(df.withColumn("v", col("v") + 1))
      df.queryExecution.analyzed.collect { case p => p }.size
    }
    (df, sizes)
  }

  private def withMode[A](m: String)(f: => A): A = {
    sys.props("graft.mat") = m
    try f finally sys.props.remove("graft.mat")
  }

  test("persist mode: plan size stays constant across 40 Mat'd rounds") {
    val (df, sizes) = withMode("persist") { iterate(40) }
    // every round's plan is a fresh LogicalRDD leaf + one Project —
    // constant size, no nesting
    assert(sizes.distinct.size == 1, s"plan sizes grew: $sizes")
    assert(df.agg(sum("v")).as[Long].head == (1 to 64).map(_ + 40L).sum)
  }

  test("persist mode preserves correctness for branching consumers") {
    val m = withMode("persist") {
      Mat((1 to 100).toDF("v").withColumn("w", col("v") * 2))
    }
    // two branches of one materialized frame agree with direct compute
    val a = m.agg(sum("v")).as[Long].head
    val b = m.filter(col("w") > 100).count()
    assert(a == 5050L && b == 50L)
  }

  test("keyed: layout visible to the planner, rows identical, all modes") {
    val base = (1 to 1000).toDF("v")
      .select((col("v") % 97).as("k"), col("v").as("x"))
    val expect = base.groupBy("k").agg(sum("x")).collect().toSet
    for (mode <- Seq(None, Some("persist"), Some("none"))) {
      def run() = {
        val m = Mat.keyed(base, col("k"))
        // the whole point of keyed: downstream ops clustered on k plan
        // WITHOUT a fresh Exchange (plain Mat comes back UnknownPartitioning)
        val agg = m.groupBy("k").agg(sum("x"))
        val hasExchange = agg.queryExecution.executedPlan.toString
          .contains("Exchange hashpartitioning")
        (agg.collect().toSet, hasExchange)
      }
      val (rows, hasExchange) = mode.map(withMode(_)(run())).getOrElse(run())
      assert(rows == expect, s"rows diverged in mode $mode")
      if (mode != Some("none")) // none keeps the lazy repartition in-plan
        assert(!hasExchange, s"mode $mode re-exchanged a keyed frame")
    }
  }

  test("components edge layout: keyed mode replays the default bit-for-bit") {
    val pairs = (1 to 400).flatMap(i => Seq((i.toLong, (i % 37).toLong)))
      .toDF("u", "v")
    val dflt = graft.operators.Components
      .labelPropagation(pairs, "u", "v", iters = 3).collect().toSet
    sys.props("graft.edge.layout") = "keyed"
    try {
      val keyed = graft.operators.Components
        .labelPropagation(pairs, "u", "v", iters = 3).collect().toSet
      assert(keyed == dflt)
    } finally sys.props.remove("graft.edge.layout")
  }

  test("default (localCheckpoint) and none modes still compute correctly") {
    val (d1, _) = iterate(5) // default
    assert(d1.agg(sum("v")).as[Long].head == (1 to 64).map(_ + 5L).sum)
    val (d2, sizes) = withMode("none") { iterate(5) }
    assert(d2.agg(sum("v")).as[Long].head == (1 to 64).map(_ + 5L).sum)
    // none mode does NOT truncate: plan grows with rounds (the contract
    // that makes it only fit for shallow plans)
    assert(sizes.last > sizes.head)
  }
}
