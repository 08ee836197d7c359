package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance planners — the metadata-scale jobs a 100 TB lake
  * needs around the data-scale operators: their inputs are file
  * inventories (one row per file, millions of rows at worst), never the
  * data itself, so every plan here is a cheap window/aggregate over a
  * frame that fits a single executor comfortably.
  */
object Maintenance {

  /** Small-file compaction plan (the OPTIMIZE/rewrite planner posture):
    * within each partition, files accumulate in stable `fileCol` order
    * and every `targetBytes` of running size opens a new output bin —
    * `bin = floor(cum_size_before / target)`, the deterministic
    * engine-replayable equivalent of greedy first-fit in listing order.
    * One row per planned rewrite task: its partition, bin ordinal, file
    * count, byte total and the [file_from, file_to] range it covers.
    * Single-file bins that already exceed the target are left alone by
    * the executor reading the plan (n_files = 1), and the plan itself
    * never touches data files — input is the file listing.
    */
  def compactionPlan(
      files: DataFrame, partCol: Column, fileCol: Column, sizeCol: Column,
      targetBytes: Long): DataFrame = {
    val w = Window.partitionBy(col("part")).orderBy(col("file"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .select(partCol.as("part"), fileCol.as("file"),
        sizeCol.cast("long").as("size_bytes"))
      .withColumn("__cb", coalesce(sum(col("size_bytes")).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cb div ${targetBytes}L"))
      .groupBy(col("part"), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("size_bytes")).as("total_bytes"),
        min(col("file")).as("file_from"),
        max(col("file")).as("file_to"))
  }

  /** Zone-map (data-skipping) effectiveness report — the planning step
    * behind parquet row-group / Delta file pruning: build per-file
    * [min, max] zone maps over one indexed column, then for each range
    * predicate report how many files the zone maps skip and how many
    * rows the surviving files still scan vs how many actually match.
    * Run it on a candidate clustering column BEFORE paying for a sort:
    * a column uncorrelated with file layout prunes ~nothing (every
    * file spans the full range) — the report makes that visible.
    *
    * A file survives a predicate `lo <= v <= hi` iff its zone overlaps:
    * `mx >= lo AND mn <= hi` — sound by construction (no matching row
    * can live in a pruned file).
    *
    * Scale shape: ONE corpus hash aggregate builds the zone maps plus
    * ONE corpus pass counts true matches for all predicates at once
    * (conditional sums); the per-predicate verdicts run on the
    * file-count-sized zone frame. Output: one row per predicate. */
  def zoneMapPrune(
      df: DataFrame, fileId: Column, value: Column,
      preds: Seq[(String, Double, Double)]): DataFrame = {
    val rows = df.select(fileId.cast("long").as("file_id"),
      value.cast("double").as("v"))
    // ONE corpus pass: zone bounds + per-predicate true-match counts,
    // all per file; materialized (file-count-sized) so the per-predicate
    // verdict aggregates below never rescan data
    val aggs = Seq(min(col("v")).as("mn"), max(col("v")).as("mx"),
      count(lit(1)).as("n_rows")) ++
      preds.map { case (label, lo, hi) =>
        sum(when(col("v") >= lo && col("v") <= hi, 1L).otherwise(0L))
          .as(s"__m_$label")
      }
    val zm = graft.Mat(rows.groupBy(col("file_id"))
      .agg(aggs.head, aggs.tail: _*))
    preds.map { case (label, lo, hi) =>
      val keep = col("mx") >= lo && col("mn") <= hi
      zm.agg(
          count(lit(1)).as("n_files"),
          sum(when(!keep, 1L).otherwise(0L)).as("n_pruned"),
          sum(col("n_rows")).as("rows_total"),
          sum(when(keep, col("n_rows")).otherwise(0L)).as("rows_scanned"),
          sum(col(s"__m_$label")).as("rows_matched"))
        .select(lit(label).as("predicate"), col("n_files"), col("n_pruned"),
          col("rows_total"), col("rows_scanned"), col("rows_matched"),
          round(lit(1.0) - col("rows_scanned").cast("double")
            / col("rows_total"), 6).as("skip_frac"))
    }.reduce(_ unionByName _)
  }
}
