package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators covering SURVEY.md §2.5 (W1–W6). */
object Windows {

  /** Date-range normalization via LEAD (W4,
    * `sql/transforms/06g-normalize-proposal-date-ranges.sql:24-60`):
    * close each effective-dated row at the next row's start minus one day;
    * the last row stays open (null, or a sentinel applied by the caller).
    */
  def leadClose(
      df: DataFrame, part: Seq[Column], order: Seq[Column],
      fromCol: String, toName: String, step: String = "1 DAY"): DataFrame = {
    val w = Window.partitionBy(part: _*).orderBy(order: _*)
    df.withColumn(toName, lead(col(fromCol), 1).over(w) - expr(s"INTERVAL $step"))
  }

  /** Percent-of-total window aggregate (W5,
    * `sql/verify/verify-pha-cleanup.sql:29`). */
  def pctOfTotal(grouped: DataFrame, cntCol: String, outName: String, scale: Int = 2): DataFrame =
    grouped.withColumn(outName,
      round(col(cntCol) * 100.0 / sum(col(cntCol)).over(Window.partitionBy()), scale))

  /** Trailing event-time aggregate: sum of `value` over the preceding
    * `days`-day RANGE frame per key, excluding the current day (upper
    * bound -1 day, so same-day peer rows never see each other) — the
    * standard feature-engineering "trailing 90-day spend" shape. RANGE
    * frames bound by event time, not row counts: gaps and same-day
    * bursts are handled by the frame, not the data layout. */
  def trailingRangeSum(
      df: DataFrame, part: Seq[Column], dateCol: Column, value: Column,
      days: Int, outName: String): DataFrame = {
    val w = Window.partitionBy(part: _*)
      .orderBy(unix_date(dateCol.cast("date"))).rangeBetween(-days, -1)
    df.withColumn(outName, sum(value).over(w))
  }

  /** Display-name sequencing (W6,
    * `scripts/transforms/consolidate-proposals.ts:427-445`):
    * `"{prefix} - {date} - {seq}"` per partition in a stable order. */
  def seqLabel(
      df: DataFrame, part: Seq[Column], order: Seq[Column],
      prefix: Column, dateCol: Column, outName: String): DataFrame = {
    val w = Window.partitionBy(part: _*).orderBy(order: _*)
    df.withColumn(outName,
      concat_ws(" - ", prefix, date_format(dateCol, "yyyy-MM-dd"),
        row_number().over(w).cast("string")))
  }
}
