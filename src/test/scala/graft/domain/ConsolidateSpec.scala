package graft.domain

import graft.SparkSpec

/** Mirrors the reference's 7 consolidation unit cases
  * (`scripts/transforms/__tests__/consolidate-proposals.test.ts:121-282`). */
class ConsolidateSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[Consolidate.PropIn]) =
    Consolidate.consolidate(rows.toDF())
      .as[Consolidate.PropOut].collect().sortBy(p => (p.group_id, p.eff_from)).toSeq

  private def p(g: String, id: String, md5: String, from: String, to: String,
      prods: Seq[String], plans: Seq[String]) =
    Consolidate.PropIn(g, id, md5, from, to, prods, plans)

  test("contiguous same-config proposals merge (test.ts:121-144)") {
    val out = run(Seq(
      p("G1", "P1", "h1", "2020-01-01", "2020-06-30", Seq("A"), Seq("x")),
      p("G1", "P2", "h1", "2020-07-01", "2020-12-31", Seq("A"), Seq("x"))))
    assert(out.size == 1)
    assert(out.head.eff_from == "2020-01-01" && out.head.eff_to == "2020-12-31")
    assert(out.head.n_merged == 2)
  }

  test("non-contiguous same-config proposals still merge — gap fill (test.ts:146-169)") {
    val out = run(Seq(
      p("G1", "P1", "h1", "2020-01-01", "2020-03-31", Seq("A"), Seq("x")),
      p("G1", "P2", "h1", "2020-09-01", "2020-12-31", Seq("A"), Seq("x"))))
    assert(out.size == 1)
    assert(out.head.eff_from == "2020-01-01" && out.head.eff_to == "2020-12-31")
  }

  test("config hash change splits the run (test.ts:171-191)") {
    val out = run(Seq(
      p("G1", "P1", "h1", "2020-01-01", "2020-06-30", Seq("A"), Seq("x")),
      p("G1", "P2", "h2", "2020-07-01", "2020-12-31", Seq("A"), Seq("x"))))
    assert(out.size == 2)
  }

  test("partial plan overlap conflicts and splits (test.ts:193-213)") {
    val out = run(Seq(
      p("G1", "P1", "h1", "2020-01-01", "2020-06-30", Seq("A"), Seq("x", "y")),
      p("G1", "P2", "h1", "2020-07-01", "2020-12-31", Seq("A"), Seq("y", "z"))))
    assert(out.size == 2) // {x,y} vs {y,z}: partial overlap -> conflict
  }

  test("products accumulate across merged proposals (test.ts:215-238)") {
    val out = run(Seq(
      p("G1", "P1", "h1", "2020-01-01", "2020-06-30", Seq("A"), Seq("x")),
      p("G1", "P2", "h1", "2020-07-01", "2020-12-31", Seq("B"), Seq("x"))))
    assert(out.size == 1)
    assert(out.head.product_codes == Seq("A", "B"))
  }

  test("group change resets the run (test.ts:240-260)") {
    val out = run(Seq(
      p("G1", "P1", "h1", "2020-01-01", "2020-06-30", Seq("A"), Seq("x")),
      p("G2", "P2", "h1", "2020-07-01", "2020-12-31", Seq("A"), Seq("x"))))
    assert(out.size == 2)
    assert(out.map(_.group_id).toSet == Set("G1", "G2"))
  }

  test("wildcard plan never conflicts (test.ts:262-282)") {
    val out = run(Seq(
      p("G1", "P1", "h1", "2020-01-01", "2020-06-30", Seq("A"), Seq("*")),
      p("G1", "P2", "h1", "2020-07-01", "2020-12-31", Seq("A"), Seq("y", "z"))))
    assert(out.size == 1) // '*' merges with anything of same config
    assert(out.head.plan_codes == Seq("*", "y", "z"))
  }

  test("identical plan sets merge (no conflict on full overlap)") {
    assert(!Consolidate.hasPlanConflict(Set("x", "y"), Set("x", "y")))
    assert(Consolidate.hasPlanConflict(Set("x", "y"), Set("y", "z")))
    assert(!Consolidate.hasPlanConflict(Set("x"), Set("y")))
    assert(!Consolidate.hasPlanConflict(Set("*"), Set("y")))
  }
}
