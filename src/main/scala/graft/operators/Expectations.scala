package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations, compiled into the minimum number
  * of passes over the data.
  *
  * The reference scatters its conformance checks across per-table audit
  * queries (SURVEY §2.4 A9, the sql/audit scripts: orphan counts, domain checks,
  * null gates) — each one a separate scan. Here a check SUITE compiles to:
  *   - ONE aggregate pass for all row-level predicates (each check is a
  *     `sum(when(violated, 1))` in the same Aggregate — N checks, 1 scan,
  *     map-side partials, no shuffle beyond the single-row agg);
  *   - one groupBy per uniqueness check (irreducible: needs the key's
  *     grouped cardinality);
  *   - one left-anti join per referential check (equi join on the FK).
  *
  * Row-level semantics: a row VIOLATES when its predicate is false OR null
  * (SQL three-valued logic would otherwise let nulls slide through a
  * `NOT pred` filter unseen).
  *
  * Output: (check_name, kind, violations, pass) — one row per check,
  * pass = violations == 0.
  */
object Expectations {

  sealed trait Check { def name: String }

  /** Violation when `pred` evaluates false or null. */
  final case class RowPredicate(name: String, kind: String, pred: Column) extends Check

  /** Violations = surplus rows beyond the first per duplicated key. */
  final case class Unique(name: String, cols: Seq[String]) extends Check

  /** Violations = rows whose non-null FK has no match in `dim`.
    * Null FKs pass (pair with a notNull check to forbid them). */
  final case class RefIntegrity(
      name: String, cols: Seq[String], dim: DataFrame, dimCols: Seq[String]) extends Check

  def notNull(name: String, c: String): RowPredicate =
    RowPredicate(name, "not_null", col(c).isNotNull)
  def inRange(name: String, c: String, lo: Any, hi: Any): RowPredicate =
    RowPredicate(name, "range", col(c).between(lo, hi))
  def inSet(name: String, c: String, values: Seq[Any]): RowPredicate =
    RowPredicate(name, "set", col(c).isin(values: _*))
  def matches(name: String, c: String, regex: String): RowPredicate =
    RowPredicate(name, "regex", col(c).rlike(regex))

  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val rowChecks = checks.collect { case r: RowPredicate => r }
    val rowPart: Seq[DataFrame] =
      if (rowChecks.isEmpty) Nil
      else {
        val aggs = rowChecks.map { r =>
          sum(when(coalesce(r.pred, lit(false)), 0L).otherwise(1L)).as(r.name)
        }
        val agged = df.agg(aggs.head, aggs.tail: _*)
        // unpivot the single agg row into (check_name, kind, violations)
        val stackArgs = rowChecks
          .map(r => s"'${r.name}', '${r.kind}', `${r.name}`").mkString(", ")
        Seq(agged.select(expr(
          s"stack(${rowChecks.size}, $stackArgs) AS (check_name, kind, violations)")))
      }

    val uniqueParts = checks.collect { case u: Unique =>
      df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("violations"))
        .select(lit(u.name).as("check_name"), lit("unique").as("kind"),
          col("violations"))
    }

    val refParts = checks.collect { case r: RefIntegrity =>
      val fkNotNull = r.cols.map(col(_).isNotNull).reduce(_ && _)
      val cond = r.cols.zip(r.dimCols)
        .map { case (f, d) => df(f) === r.dim(d) }.reduce(_ && _)
      df.filter(fkNotNull).join(r.dim, cond, "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(r.name).as("check_name"), lit("ref").as("kind"),
          col("violations"))
    }

    (rowPart ++ uniqueParts ++ refParts)
      .reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0)
  }
}
