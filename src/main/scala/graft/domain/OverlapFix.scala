package graft.domain

import java.time.LocalDate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping-date-range repair with `-CONT` continuations
  * (`scripts/proposal-builder.ts:1503-1700`, spec at `:1486-1501`,
  * example group G26683).
  *
  * Per group, proposals sorted by start date: when a proposal's range
  * overlaps the next proposal's start, it is truncated to next.start - 1
  * day; any (product, plan) pair the truncated proposal carried that the
  * next proposal does NOT carry gets a continuation proposal
  * (`{id}-CONT`) covering the truncated tail — so coverage for those
  * pairs survives the succession.
  *
  * Same scale stance as [[Consolidate]]: shuffle by group, sequential
  * scan within the task.
  */
object OverlapFix {

  case class FixIn(
      group_id: String, proposal_id: String,
      eff_from: String, eff_to: String,
      product_codes: Seq[String], plan_codes: Seq[String])

  case class FixOut(
      group_id: String, proposal_id: String,
      eff_from: String, eff_to: String,
      product_codes: Seq[String], plan_codes: Seq[String],
      is_continuation: Boolean)

  def fix(proposals: DataFrame): DataFrame = {
    val spark = proposals.sparkSession
    import spark.implicits._
    val prepared = proposals.select(
      col("group_id").cast("string"), col("proposal_id").cast("string"),
      col("eff_from").cast("string"), col("eff_to").cast("string"),
      col("product_codes").cast("array<string>"), col("plan_codes").cast("array<string>"))
      .as[FixIn]
    prepared
      .groupByKey(_.group_id)
      .flatMapGroups { (gid, it) =>
        val sorted = it.toArray.sortBy(p => (p.eff_from, p.proposal_id))
        val out = scala.collection.mutable.ArrayBuffer.empty[FixOut]
        var i = 0
        while (i < sorted.length) {
          val cur = sorted(i)
          val next = if (i + 1 < sorted.length) sorted(i + 1) else null
          val overlaps = next != null && cur.eff_to != null &&
            cur.eff_to >= next.eff_from // ISO date strings compare correctly
          if (!overlaps) {
            out += FixOut(gid, cur.proposal_id, cur.eff_from, cur.eff_to,
              cur.product_codes, cur.plan_codes, is_continuation = false)
          } else {
            // truncate to next.start - 1 day (proposal-builder.ts:1046-1050)
            val truncatedTo = LocalDate.parse(next.eff_from).minusDays(1).toString
            out += FixOut(gid, cur.proposal_id, cur.eff_from, truncatedTo,
              cur.product_codes, cur.plan_codes, is_continuation = false)
            // pairs present in cur but absent from next continue
            val nextPairs = for (p <- next.product_codes; pl <- next.plan_codes) yield (p, pl)
            val curPairs = for (p <- cur.product_codes; pl <- cur.plan_codes) yield (p, pl)
            val orphaned = curPairs.filterNot(nextPairs.toSet)
            if (orphaned.nonEmpty) {
              out += FixOut(gid, s"${cur.proposal_id}-CONT", next.eff_from, cur.eff_to,
                orphaned.map(_._1).distinct.sorted, orphaned.map(_._2).distinct.sorted,
                is_continuation = true)
            }
          }
          i += 1
        }
        out.iterator
      }
      .toDF()
  }
}
