package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("min-label propagation finds components across a long chain") {
    // path 1-2-3-4-5 (diameter 4: takes multiple rounds) + clique 10,11,12
    // + isolated pair (20,21)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("a", "b")
    val got = Components.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(got(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got.size == 10)
  }

  test("edge direction does not matter") {
    val pairs = Seq((5L, 1L), (1L, 9L)).toDF("a", "b") // labels flow both ways
    val got = Components.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 5L -> 1L, 9L -> 1L))
  }

  test("empty pair list yields empty components") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Components.connectedComponents(pairs, "a", "b").count() == 0L)
  }
}
