package graft.domain

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Iterative proposal consolidation — the reference's canonical
  * order-dependent state machine
  * (`scripts/transforms/consolidate-proposals.ts:130-245`; plan-conflict
  * rule `:250-260`; total sort `:74-80`), as a per-group `flatMapGroups`.
  *
  * Rules, scanning proposals sorted by (group, eff_from, config_md5):
  *  1. group change          -> close current run, start new
  *  2. config hash change    -> close current run, start new
  *  3. plan-code conflict    -> close current run, start new (a `'*'`
  *     wildcard never conflicts; any partial overlap of concrete plan
  *     sets conflicts)
  *  4. otherwise             -> extend date range, union product/plan sets
  *
  * Scale stance: one shuffle on group_id, streams each group's proposals
  * through the state machine inside the task — only one group's rows are
  * ever materialized (the reference holds the full dataset in a single
  * Node process).
  */
object Consolidate {

  case class PropIn(
      group_id: String, proposal_id: String, config_md5: String,
      eff_from: String, eff_to: String,
      product_codes: Seq[String], plan_codes: Seq[String])

  case class PropOut(
      group_id: String, consolidated_id: String, config_md5: String,
      eff_from: String, eff_to: String,
      product_codes: Seq[String], plan_codes: Seq[String], n_merged: Int)

  /** `hasPlanConflict` (`consolidate-proposals.ts:250-260`): wildcard
    * matches nothing for conflict purposes; concrete sets conflict when
    * they PARTIALLY overlap (identical sets merge cleanly; disjoint sets
    * accumulate; partial overlap is ambiguous -> conflict). */
  private[domain] def hasPlanConflict(a: Set[String], b: Set[String]): Boolean = {
    val ac = a - "*"
    val bc = b - "*"
    if (ac.isEmpty || bc.isEmpty) false
    else {
      val inter = ac intersect bc
      inter.nonEmpty && inter != ac.union(bc)
    }
  }

  def consolidate(proposals: DataFrame): DataFrame = {
    val spark = proposals.sparkSession
    import spark.implicits._
    val prepared = proposals.select(
      col("group_id").cast("string"), col("proposal_id").cast("string"),
      col("config_md5").cast("string"),
      col("eff_from").cast("string"), col("eff_to").cast("string"),
      col("product_codes").cast("array<string>"), col("plan_codes").cast("array<string>"))
      .as[PropIn]
    prepared
      .groupByKey(_.group_id)
      .flatMapGroups { (gid, it) =>
        // total order incl. MD5 tiebreak (consolidate-proposals.ts:74-80)
        val sorted = it.toArray.sortBy(p => (p.eff_from, p.config_md5, p.proposal_id))
        val out = scala.collection.mutable.ArrayBuffer.empty[PropOut]
        var cur: PropOut = null
        var seq = 0
        def close(): Unit = if (cur != null) out += cur
        sorted.foreach { p =>
          val pPlans = p.plan_codes.toSet
          val pProds = p.product_codes.toSet
          if (cur == null) {
            seq += 1
            cur = PropOut(gid, s"$gid-C$seq", p.config_md5, p.eff_from, p.eff_to,
              p.product_codes.distinct.sorted, p.plan_codes.distinct.sorted, 1)
          } else if (cur.config_md5 != p.config_md5 ||                       // rule 2
            hasPlanConflict(cur.plan_codes.toSet, pPlans)) {                 // rule 3
            close(); seq += 1
            cur = PropOut(gid, s"$gid-C$seq", p.config_md5, p.eff_from, p.eff_to,
              p.product_codes.distinct.sorted, p.plan_codes.distinct.sorted, 1)
          } else {                                                           // rule 4
            cur = cur.copy(
              eff_to = if (p.eff_to == null) null
                else if (cur.eff_to == null) null
                else Seq(cur.eff_to, p.eff_to).max,
              product_codes = (cur.product_codes.toSet ++ pProds).toSeq.sorted,
              plan_codes = (cur.plan_codes.toSet ++ pPlans).toSeq.sorted,
              n_merged = cur.n_merged + 1)
          }
        }
        close()
        out.iterator
      }
      .toDF()
  }
}
