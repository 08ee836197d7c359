package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-statistics operators for data-quality reporting at corpus scale.
  */
object Stats {

  /** Fixed-width histogram of `value` over [lo, hi) with `bins` buckets;
    * values outside clamp into the edge buckets. Portable arithmetic
    * (floor of a linear map — no engine-specific width_bucket), one hash
    * aggregate with map-side partials. Empty buckets are absent (callers
    * needing dense axes join a bucket spine). */
  def histogram(
      df: DataFrame, value: Column,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, "need bins > 0 and hi > lo")
    val width = (hi - lo) / bins
    val raw = floor((value - lo) / width).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit(bins.toLong - 1))
    df.filter(value.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(value), 6).as("vmin"),
        round(max(value), 6).as("vmax"))
  }

  /** Per-group z-score outlier flags: z = (x - mean_g) / stddev_g (sample
    * stddev), rounded at 4; |z| > `threshold` flags the row. Group stats
    * come from one hash aggregate joined back (group count is bounded by
    * the key's cardinality — AQE broadcasts), so the fact side never
    * windows over corpus-sized partitions. Groups with fewer than 2 rows
    * or zero variance emit z = 0 (nothing to deviate from). */
  def zScoreOutliers(
      df: DataFrame, group: Column, id: Column, value: Column,
      threshold: Double = 3.0): DataFrame = {
    val stats = df.groupBy(group.as("__g"))
      .agg(avg(value).as("__mean"), stddev_samp(value).as("__sd"))
    df.join(stats, group === col("__g"), "inner")
      .withColumn("z",
        when(col("__sd").isNull || col("__sd") === 0.0, lit(0.0))
          .otherwise(round((value - col("__mean")) / col("__sd"), 4)))
      .withColumn("is_outlier", abs(col("z")) > threshold)
      .drop("__g", "__mean", "__sd")
  }
}
