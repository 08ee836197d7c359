package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * At 100 TB the scan you avoid is the cheapest scan: writers lay files
  * out so per-file min/max statistics prune range predicates on MORE
  * than one column. A lexicographic sort only serves its leading column;
  * interleaving the bits of two keys (Morton / Z-order — the technique
  * behind "OPTIMIZE ZORDER BY" in lakehouse table formats) keeps both
  * columns' value ranges tight within every run of the sorted output.
  */
object Layout {

  /** Morton / Z-order index of two non-negative integer columns: bit i
    * of `a` lands at position 2i, bit i of `b` at 2i+1. Pure bitwise
    * column arithmetic (codegen'd, engine-replayable — any engine with
    * shifts reproduces it exactly). `bits` caps the per-column width. */
  def zOrder2(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The layout effect, measurable: bucket rows by the top bits of their
    * z-index (a stand-in for "file" assignment under a z-ordered write)
    * and report each bucket's min/max on BOTH dimensions — the min/max
    * stats a reader's predicate pushdown prunes against. Tight ranges on
    * both columns = both predicates skip files; a lexicographic layout
    * would show full-width ranges on the second column. */
  def zBucketStats(
      df: DataFrame, a: Column, b: Column,
      bits: Int = 16, bucketShift: Int = 20): DataFrame =
    df.select(a.cast("long").as("__a"), b.cast("long").as("__b"))
      .withColumn("bucket",
        shiftright(zOrder2(col("__a"), col("__b"), bits), bucketShift))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__a")).as("min_a"), max(col("__a")).as("max_a"),
        min(col("__b")).as("min_b"), max(col("__b")).as("max_b"))
}
