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
  test("pageRank: star graph gives the hub the highest rank; deterministic") {
    // edges: 1->0, 2->0, 3->0 and back — node 0 is the hub
    val e = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L), (0L, 2L), (0L, 3L))
      .toDF("src", "dst")
    val r = Components.pageRank(e, "src", "dst", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(r(0L) > r(1L) && r(0L) > r(2L) && r(0L) > r(3L))
    // spokes are symmetric
    assert(r(1L) == r(2L) && r(2L) == r(3L))
    val again = Components.pageRank(e, "src", "dst", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(r == again)
  }

  test("pageRank: sink keeps the floor rank; no in-edges = 1 - damping") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val r = Components.pageRank(e, "src", "dst", iters = 2)
      .as[(Long, Double)].collect().toMap
    assert(r(1L) == 0.15) // no in-edges
    assert(r(2L) == 0.2775) // 0.15 + 0.85 * 0.15, rounded at 9 in-query
  }

  test("triangleCounts: K4 minus an edge, dups/reversed/self-loops canonicalized") {
    // K4 on {1,2,3,4} without edge (1,4): triangles (1,2,3) and (2,3,4);
    // vertices 2,3 sit in both. Noise: duplicate edge, reversed edge,
    // self-loop — all must be absorbed by canonicalization.
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 3L), (4L, 4L))
      .toDF("a", "b")
    val got = Components.triangleCounts(edges, col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangleCounts: triangle-free graph returns no rows") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    assert(Components.triangleCounts(edges, col("a"), col("b")).count() == 0)
  }
}
