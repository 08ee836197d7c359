package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Classifier-evaluation metric contracts (round-13 additions): ROC-AUC,
  * calibration (ECE/MCE/Brier), Cohen's kappa, Dunning LLR keyness, and
  * the filtered-ANN post-filter cut. */
class EvalMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Double, Int)]): (Long, Long, Double, Double) =
    Stats.rocAuc(rows.toDF("s", "y"), col("s"), col("y"))
      .as[(Long, Long, Double, Double)].collect().head

  test("rocAuc: perfect separation is 1, inverted is 0") {
    val (np, nn, a, g) = auc(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)))
    assert((np, nn, a, g) == ((2L, 2L, 1.0, 1.0)))
    val (_, _, a2, g2) = auc(Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)))
    assert(a2 == 0.0 && g2 == -1.0)
  }

  test("rocAuc: all-tied scores give AUC 0.5 (midrank convention)") {
    val (_, _, a, g) = auc(Seq((0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0)))
    assert(a == 0.5 && g == 0.0)
  }

  test("rocAuc matches the pairwise P(s_pos > s_neg) + ties/2 definition") {
    val rows = Seq((0.8, 1), (0.5, 1), (0.3, 1), (0.5, 0), (0.2, 0))
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val exp = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size)
    val (_, _, a, _) = auc(rows)
    assert(a == exp, s"got $a expected $exp") // 4.5/6 = 0.75 exactly
  }

  private def cal(rows: Seq[(Double, Int)], bins: Int = 10) =
    Stats.calibrationReport(rows.toDF("p", "y"), col("p"), col("y"), bins)
      .as[(Long, Long, Double, Double, Double)].collect().head

  test("calibrationReport: a perfectly calibrated bin scores ECE 0") {
    val (n, nb, ece, mce, brier) = cal(Seq((0.5, 1), (0.5, 0)))
    assert((n, nb) == ((2L, 1L)))
    assert(ece == 0.0 && mce == 0.0 && brier == 0.25)
  }

  test("calibrationReport: one confident miss is fully penalized") {
    val (_, _, ece, mce, brier) = cal(Seq((0.9, 0)))
    assert(ece == 0.9 && mce == 0.9 && brier == 0.81)
  }

  test("calibrationReport: p=1.0 clamps into the top bin; ECE aggregates bins") {
    // bin 9 holds {1.0->1, 0.95->1} (conf .975, acc 1, |gap| .05);
    // bin 0 holds {0.0->0} (gap 0): ECE = 0.05/3, MCE = .05/2
    val (n, nb, ece, mce, _) = cal(Seq((1.0, 1), (0.95, 1), (0.0, 0)))
    assert((n, nb) == ((3L, 2L)))
    assert(ece == math.rint(0.05 / 3 * 1e6) / 1e6)
    assert(mce == 0.025)
  }

  private def kappa(rows: Seq[(String, String)]): (Long, Long, Double, Double, Double) =
    Stats.cohensKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Double, Double, Double)].collect().head

  test("cohensKappa: the textbook 2x2 example scores 0.4") {
    // 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no:
    // po = 0.7, pe = (25*30 + 25*20)/2500 = 0.5, kappa = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val (n, nc, po, pe, k) = kappa(rows)
    assert((n, nc) == ((50L, 2L)))
    assert(po == 0.7 && pe == 0.5 && k == 0.4)
  }

  test("cohensKappa: perfect agreement is 1; a one-sided category still counts") {
    val (_, nc, _, _, k) = kappa(Seq(("a", "a"), ("b", "b"), ("c", "c")))
    assert(k == 1.0 && nc == 3L)
    // rater B never says 'c': category union spans both raters
    val (_, nc2, _, _, _) = kappa(Seq(("c", "a"), ("a", "a"), ("b", "b")))
    assert(nc2 == 3L)
  }

  test("cohensKappa: statistically independent raters score ~0") {
    // every (a,b) cell equally likely -> po = pe -> kappa = 0
    val rows = for (a <- Seq("x", "y"); b <- Seq("x", "y"); _ <- 1 to 5)
      yield (a, b)
    val (_, _, po, pe, k) = kappa(rows)
    assert(po == pe && k == 0.0)
  }

  test("llrKeyness: only A-skewed tokens survive; skew orders the statistic") {
    // 'alpha' only in A (8x), 'beta' mildly A-skewed, 'even' balanced,
    // 'bonly' only in B - filler 'pad' keeps totals asymmetric
    val docs = Seq(
      ("alpha alpha alpha alpha alpha alpha alpha alpha beta beta beta even even pad", true),
      ("beta even even bonly bonly bonly bonly bonly pad pad pad pad pad pad", false))
      .toDF("text", "is_a")
    val got = graft.functions.TextFunctions
      .llrKeyness(docs.toDF(), col("text"), col("is_a"), minCount = 2L, topN = 10)
      .as[(Int, String, Long, Long, Double)].collect()
    val terms = got.map(_._2).toSet
    assert(terms.contains("alpha") && !terms.contains("bonly") && !terms.contains("pad"))
    val byTerm = got.map(r => r._2 -> r._5).toMap
    assert(byTerm("alpha") > byTerm.getOrElse("beta", 0.0))
    // hand-check alpha's G2 via the closed form (a=8,b=0,A=14,B=14)
    def xlx(x: Double) = if (x > 0) x * math.log(x) else 0.0
    val (a, b, ta, tb) = (8.0, 0.0, 14.0, 14.0)
    val exp = 2.0 * (xlx(a) + xlx(b) + xlx(ta - a) + xlx(tb - b) + xlx(ta + tb)
      - xlx(a + b) - xlx(ta + tb - a - b) - xlx(ta) - xlx(tb))
    assert(math.abs(byTerm("alpha") - exp) < 5e-7)
  }

  test("postFilterTopK: filters on the pass set, re-ranks, cuts to k") {
    val ann = Seq(
      (1L, 10L, 0.9, 1), (1L, 11L, 0.8, 2), (1L, 12L, 0.7, 3), (1L, 13L, 0.6, 4),
      (2L, 10L, 0.5, 1), (2L, 14L, 0.4, 2))
      .toDF("query_id", "neighbor_id", "cos", "rank")
    val pass = Seq(11L, 13L, 14L).toDF("vec_id")
    val got = Similarity.postFilterTopK(ann, pass, k = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(got.toSeq == Seq((1L, 11L, 0.8, 1), (1L, 13L, 0.6, 2), (2L, 14L, 0.4, 1)))
  }
}
