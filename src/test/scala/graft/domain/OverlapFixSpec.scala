package graft.domain

import graft.SparkSpec

/** Succession scenario (FIXTURES.md #3, reference example G26683,
  * `proposal-builder.ts:1486-1501`). */
class OverlapFixSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[OverlapFix.FixIn]) =
    OverlapFix.fix(rows.toDF()).as[OverlapFix.FixOut].collect()
      .sortBy(p => (p.eff_from, p.proposal_id)).toSeq

  test("overlap truncates to next.start - 1 and emits -CONT for orphaned pairs") {
    val out = run(Seq(
      OverlapFix.FixIn("G26683", "P1", "2020-01-01", "2020-12-31",
        Seq("A", "B"), Seq("x")),          // carries A and B
      OverlapFix.FixIn("G26683", "P2", "2020-07-01", "2021-06-30",
        Seq("A"), Seq("x"))))              // successor drops B
    assert(out.size == 3)
    val p1 = out.find(_.proposal_id == "P1").get
    assert(p1.eff_to == "2020-06-30") // truncated
    val cont = out.find(_.is_continuation).get
    assert(cont.proposal_id == "P1-CONT")
    assert(cont.eff_from == "2020-07-01" && cont.eff_to == "2020-12-31")
    assert(cont.product_codes == Seq("B")) // only the orphaned pair continues
  }

  test("no overlap -> passthrough, no continuations") {
    val out = run(Seq(
      OverlapFix.FixIn("G1", "P1", "2020-01-01", "2020-06-30", Seq("A"), Seq("x")),
      OverlapFix.FixIn("G1", "P2", "2020-07-01", null, Seq("A"), Seq("x"))))
    assert(out.size == 2 && !out.exists(_.is_continuation))
    assert(out.find(_.proposal_id == "P1").get.eff_to == "2020-06-30")
  }

  test("successor with identical pairs -> truncation but no continuation") {
    val out = run(Seq(
      OverlapFix.FixIn("G1", "P1", "2020-01-01", "2020-12-31", Seq("A"), Seq("x")),
      OverlapFix.FixIn("G1", "P2", "2020-07-01", null, Seq("A"), Seq("x"))))
    assert(out.size == 2 && !out.exists(_.is_continuation))
    assert(out.find(_.proposal_id == "P1").get.eff_to == "2020-06-30")
  }
}
