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

  test("kCore: peeling cascades down a tail and keeps the dense core") {
    // triangle {1,2,3} + tail 3-4-5: the 2-core peels 5 (deg 1), which
    // drops 4 to deg 1 (second round), leaving exactly the triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = Components.kCore(pairs, "a", "b", k = 2, rounds = 5)
      .as[(Long, Int, Int)].collect()
    assert(got.map(r => r._1 -> r._2).toMap == Map(1L -> 2, 2L -> 2, 3L -> 2))
    assert(got.forall(_._3 == 1))
  }

  test("kCore: fully peelable graph returns no rows") {
    // a path has no 2-core: endpoints peel inward until nothing is left
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("a", "b")
    assert(Components.kCore(pairs, "a", "b", k = 2, rounds = 10).count() == 0)
  }

  test("kCore: converged=0 when the round budget stops before the fixpoint") {
    // the same path needs ~3 synchronous rounds to vanish; 1 round
    // leaves survivors AND reports non-convergence
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
      .toDF("a", "b")
    val got = Components.kCore(pairs, "a", "b", k = 2, rounds = 1)
      .as[(Long, Int, Int)].collect()
    assert(got.nonEmpty && got.forall(_._3 == 0))
    assert(got.map(_._1).sorted.toSeq == Seq(2L, 3L, 4L, 5L, 6L))
  }

  test("hits: bipartite star — shared target dominates authority, multi-pointer dominates hubs") {
    // 1->10, 2->10, 3->10, 3->11: node 10 is the consensus authority,
    // node 3 the strongest hub (it points at both authorities)
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L)).toDF("s", "t")
    val got = Components.hits(edges, "s", "t", iters = 3)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size == 5)
    // sources have no in-edges, targets no out-edges
    Seq(1L, 2L, 3L).foreach(n => assert(got(n)._2 == 0.0, s"auth($n)"))
    Seq(10L, 11L).foreach(n => assert(got(n)._1 == 0.0, s"hub($n)"))
    assert(got(10L)._2 > got(11L)._2)
    assert(got(3L)._1 > got(1L)._1 && got(1L)._1 == got(2L)._1)
    // L1 normalization: each score family sums to 1
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-6)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-6)
  }

  test("kCore: duplicate and reversed edges canonicalize; K4 survives k=3") {
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (3L, 4L), (4L, 9L))
      .toDF("a", "b")
    val got = Components.kCore(pairs, "a", "b", k = 3, rounds = 4)
      .as[(Long, Int, Int)].collect()
    assert(got.map(r => r._1 -> r._2).toMap ==
      Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3))
    assert(got.forall(_._3 == 1))
  }

  test("linkPrediction: two wedges score CN/Jaccard/Adamic-Adar; edges excluded") {
    // u=1, v=2 share neighbors z1=10 (deg 2) and z2=11 (deg 3, also
    // touching 3); (1,2) is NOT an edge -> predicted. (11,3) IS an edge
    // via wedge... no wedge connects them twice; and the (1,3)/(2,3)
    // pairs share only z=11 -> below minCommon=2.
    val pairs = Seq((1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L), (3L, 11L))
      .toDF("a", "b")
    val got = Components.linkPrediction(pairs, "a", "b",
        minCommon = 2, maxHubDeg = 10)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // two predicted pairs: (1,2) via {10,11} and (10,11) via {1,2}
    assert(got.size == 2)
    def q9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (_, _, cn12, du12, dv12, jac12, aa12) = got((1L, 2L))
    assert((cn12, du12, dv12) == ((2L, 2L, 2L)))
    assert(jac12 == 1.0) // 2 / (2 + 2 - 2)
    // AA = 1/ln(deg 10) + 1/ln(deg 11) = 1/ln(2) + 1/ln(3)
    assert(aa12 == r6(q9(1.0 / math.log(2.0)) + q9(1.0 / math.log(3.0))))
    val (_, _, cnAB, duAB, dvAB, jacAB, aaAB) = got((10L, 11L))
    assert((cnAB, duAB, dvAB) == ((2L, 2L, 3L)))
    assert(jacAB == r6(2.0 / 3.0)) // 2 / (2 + 3 - 2)
    assert(aaAB == r6(q9(1.0 / math.log(2.0)) * 2)) // centers 1 and 2, both deg 2
  }

  test("personalizedPageRank: mass concentrates near the seed, decays with hops") {
    // path 1-2-3-4-5-6, seed {1}. Synchronous iteration oscillates by
    // walk parity on a path (hand-traced: r4(3) > r4(2) is CORRECT at
    // iters=4), so decay is asserted within each parity class
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("a", "b")
    val got = Components.personalizedPageRank(pairs, "a", "b",
        Seq(1L).toDF("node"), iters = 4)
      .as[(Long, Double)].collect().toMap
    assert(got.size == 6)
    assert(got(1L) > got(3L) && got(3L) > got(5L), got.toSeq.sorted.mkString(","))
    assert(got(2L) > got(4L) && got(4L) > got(6L), got.toSeq.sorted.mkString(","))
    // restart mass keeps the seed on top of its class and of everything
    assert(got(1L) > 0.1 && got.values.max == got(1L))
    // deterministic across partitionings
    val again = Components.personalizedPageRank(
        pairs.repartition(5), "a", "b", Seq(1L).toDF("node"), iters = 4)
      .as[(Long, Double)].collect().toMap
    assert(again == got)
  }

  test("personalizedPageRank: multiple seeds split the restart mass") {
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("a", "b") // two components
    val got = Components.personalizedPageRank(pairs, "a", "b",
        Seq(1L, 3L).toDF("node"), iters = 2)
      .as[(Long, Double)].collect().toMap
    // symmetric components with one seed each: identical score profiles
    assert(got(1L) == got(3L) && got(2L) == got(4L))
    assert(got(1L) > got(2L))
  }

  test("modularity: two cliques under their own labels score high; one-blob zero") {
    // two K3s, no bridge: perfect partition. m=6; per community:
    // within=3, deg=6 -> term = 3/6 - (6/12)^2 = 0.25; Q = 0.5
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val goodLab = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 2L), (11L, 2L), (12L, 2L)).toDF("node", "community")
    val q = Components.modularity(pairs, "a", "b", goodLab)
      .as[(Long, Long, Double)].collect().head
    assert(q == ((2L, 6L, 0.5)))
    // everything in ONE community: Q = m/m - (2m/2m)^2 = 0 exactly
    val oneLab = (Seq(1L, 2L, 3L, 10L, 11L, 12L)).map(n => (n, 0L))
      .toDF("node", "community")
    val q1 = Components.modularity(pairs, "a", "b", oneLab)
      .as[(Long, Long, Double)].collect().head
    assert(q1 == ((1L, 6L, 0.0)))
    // splitting a clique (worse partition) scores LOWER than the truth
    val badLab = Seq((1L, 1L), (2L, 7L), (3L, 1L),
      (10L, 2L), (11L, 2L), (12L, 2L)).toDF("node", "community")
    val qb = Components.modularity(pairs, "a", "b", badLab)
      .as[(Long, Long, Double)].collect().head
    assert(qb._3 < 0.5)
  }

  test("assortativity: a star is perfectly disassortative; regular graphs null") {
    // hub 0 with 4 spokes: every edge joins deg-4 to deg-1 -> r = -1
    val star = (1L to 4L).map(x => (0L, x)).toDF("a", "b")
    val gs = Components.assortativity(star, "a", "b")
      .as[(Long, Long, Option[Double])].collect().head
    assert(gs == ((5L, 4L, Some(-1.0))))
    // a single edge: both endpoints deg 1 -> zero variance -> null
    val pair = Seq((1L, 2L)).toDF("a", "b")
    val gp = Components.assortativity(pair, "a", "b")
      .as[(Long, Long, Option[Double])].collect().head
    assert(gp == ((2L, 1L, None)))
  }

  test("clusteringCoefficient: triangle + pendant replays by hand") {
    // triangle {1,2,3} + pendant 4-3: degs 2,2,3,1; T=1; wedges 1,1,3,0
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Components.clusteringCoefficient(pairs, "a", "b")
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert((got._1, got._2, got._3) == ((4L, 1L, 5L)))
    assert(got._4 == 0.6) // 3T/W = 3/5
    // locals: 1/1, 1/1, round9(1/3); pendant excluded (deg 1)
    val third = math.floor(1.0 / 3.0 * 1e9 + 0.5) / 1e9
    val exp = BigDecimal((1.0 + 1.0 + third) / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._5 == exp, s"avg_local ${got._5} expected $exp")
  }

  test("bfsLevels: path-graph distances, multi-source min, budget truncation") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    def run(src: Seq[Long], rounds: Int) =
      Components.bfsLevels(pairs, "a", "b", src.toDF("node"), rounds)
        .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val one = run(Seq(1L), 5)
    assert(one.map { case (n, (dd, _)) => n -> dd } ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    assert(one.values.forall(_._2 == 1)) // round 5 adds nothing: converged
    val short = run(Seq(1L), 2)
    assert(short.map { case (n, (dd, _)) => n -> dd } ==
      Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(short.values.forall(_._2 == 0)) // frontier still moving
    val multi = run(Seq(1L, 5L), 4)
    assert(multi.map { case (n, (dd, _)) => n -> dd } ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0))
  }

  test("bfsLevels: off-graph sources still seed; unreached nodes absent") {
    val pairs = Seq((1L, 2L), (10L, 11L)).toDF("a", "b")
    val got = Components.bfsLevels(pairs, "a", "b", Seq(1L, 99L).toDF("node"), 3)
      .as[(Long, Int, Int)].collect().map(r => r._1 -> r._2).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 99L -> 0)) // 10/11 unreached
  }

  test("labelPropagation: two bridged triangles settle into two communities") {
    // K3 {1,2,3} -- bridge (3,10) -- K3 {10,11,12}; hand-simulated
    // synchronous rounds converge by t=4 to labels 1 and 3
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 10L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val got = Components.labelPropagation(pairs, "a", "b", iters = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size == 6)
    Seq(1L, 2L, 3L).foreach(n => assert(got(n) == ((1L, 3L)), s"node $n"))
    Seq(10L, 11L, 12L).foreach(n => assert(got(n) == ((3L, 3L)), s"node $n"))
  }

  test("labelPropagation is a pure function of the round budget (replay-stable)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L),
      (20L, 21L)).toDF("a", "b")
    val r1 = Components.labelPropagation(pairs, "a", "b", iters = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val r2 = Components.labelPropagation(
        pairs.orderBy(col("b")).repartition(5), "a", "b", iters = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r1 == r2)
    // community sizes partition the node set
    assert(r1.map(_._1).distinct.size == 7)
  }

  test("linkPrediction: existing edges never predicted; hub cap drops wedges") {
    // triangle 1-2-3 (all edges exist -> nothing at distance 2) plus a
    // hub 100 connected to 20..24: hub wedges exist, but capping the
    // hub degree below 5 removes them all
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val hub = (20L to 24L).map(x => (100L, x))
    val pairs = (tri ++ hub).toDF("a", "b")
    val all = Components.linkPrediction(pairs, "a", "b",
      minCommon = 1, maxHubDeg = 10)
    // triangle contributes nothing (all pairs are edges); hub wedges
    // predict the C(5,2) spoke pairs
    assert(all.count() == 10)
    val capped = Components.linkPrediction(pairs, "a", "b",
      minCommon = 1, maxHubDeg = 4)
    assert(capped.count() == 0)
  }

  test("personalizedPageRank rejects damping/restart that do not sum to 1") {
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val seeds = Seq(1L).toDF("node")
    intercept[IllegalArgumentException] {
      Components.personalizedPageRank(pairs, "a", "b", seeds,
        iters = 1, damping = 0.9) // restart left at 0.15 -> mass leak
    }
  }

  test("kahnCycleCore: functional graph peels tails, keeps exactly the cycle") {
    // cycle 1->2->3->1 with a depth-2 tail 5->4->1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (5L, 4L)).toDF("s", "t")
    val out = Components.kahnCycleCore(e, "s", "t", rounds = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(out(5L) == ((1, false, true)))  // leaf peels first
    assert(out(4L) == ((2, false, true)))  // exposed once 5 left
    assert(Seq(1L, 2L, 3L).forall(n => out(n) == ((0, true, true))))
  }

  test("kahnCycleCore: residual includes cycle descendants; converged flags budget") {
    // cycle 2<->3 with descendant 4 (2->4) and tail 1->2
    val e = Seq((1L, 2L), (2L, 3L), (3L, 2L), (2L, 4L)).toDF("s", "t")
    val out = Components.kahnCycleCore(e, "s", "t", rounds = 3)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((1, false)))
    // 4 never peels: its in-edge comes from the live cycle — residual
    // semantics (cycles + descendants), exact cycles only for out-deg-1
    assert(Seq(2L, 3L, 4L).forall(n => out(n)._2))
    // rounds = 1 cannot certify: round 1 peeled node 1, so the last
    // round did real work and converged must be false
    val tight = Components.kahnCycleCore(e, "s", "t", rounds = 1)
    assert(tight.select("converged").distinct().collect().head.getBoolean(0) == false)
  }
}
