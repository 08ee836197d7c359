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

  /** Ordered funnel analysis: for each user, the earliest time of each
    * stage GIVEN the previous stage happened earlier — `stage` counts how
    * far the user progressed (0 = never entered). The standard product /
    * event-stream conversion query.
    *
    * Scale shape: one conditional aggregate for stage 1, then one equi
    * join + filtered aggregate per later stage — every shuffle keys on
    * the user id, so the partitioning is reused across stages; no
    * windows over whole event histories. */
  def funnel(
      events: DataFrame, user: Column, ts: Column, eventType: Column,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val base = events.select(user.as("user_id"), ts.as("__ts"), eventType.as("__et"))
    val users = base.select(col("user_id")).distinct()
    var acc = users.join(
      base.filter(col("__et") === stages.head)
        .groupBy(col("user_id")).agg(min(col("__ts")).as("t_0")),
      Seq("user_id"), "left")
    for (i <- 1 until stages.length) {
      val prev = s"t_${i - 1}"
      val next = base.filter(col("__et") === stages(i))
        .join(acc.select(col("user_id"), col(prev)), Seq("user_id"))
        .filter(col("__ts") > col(prev))
        .groupBy(col("user_id")).agg(min(col("__ts")).as(s"t_$i"))
      acc = acc.join(next, Seq("user_id"), "left")
    }
    // deepest stage wins: fold ascending so t_{n-1} ends up outermost
    val stage = stages.indices.foldLeft(lit(0)) { (e, i) =>
      when(col(s"t_$i").isNotNull, i + 1).otherwise(e)
    }
    acc.withColumn("stage", stage)
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

  /** Time-decayed aggregation (recency-weighted feature engineering:
    * activity scores, rolling engagement): each row's value is weighted
    * by `1 / 2^floor(age / halfLife)` relative to the NEWEST row in the
    * frame, then summed per key.
    *
    * Determinism across engines without libm: the decay bucket is an
    * integer, and `1 / 2^k` is an EXACT power-of-two double (computed by
    * bit shift + one exact division — never `pow`/`exp`, whose last-ulp
    * behavior differs across math libraries); weighted values are
    * rounded then summed as DECIMAL. The reference date comes from a
    * 1-row aggregate broadcast, not a driver collect. */
  def decayedSum(
      df: DataFrame, key: Column, value: Column, ts: Column,
      halfLifeDays: Int): DataFrame = {
    val ref = df.agg(max(to_date(ts)).as("__ref"))
    df.select(key.as("key"), value.as("__v"), to_date(ts).as("__d"))
      .crossJoin(broadcast(ref))
      .withColumn("__k",
        floor(datediff(col("__ref"), col("__d")) / halfLifeDays).cast("int"))
      .withColumn("__w",
        lit(1.0) / expr("shiftleft(cast(1 as bigint), __k)").cast("double"))
      .withColumn("__wv", round(col("__v") * col("__w"), 6).cast("decimal(18,6)"))
      .groupBy(col("key"))
      .agg(sum(col("__wv")).cast("double").as("decayed_value"),
        count(lit(1)).as("n_events"))
  }

  /** Incremental aggregate maintenance: merge partial aggregate states
    * (each a keyed frame of decomposable measures — sums/counts — e.g.
    * yesterday's materialized rollup plus today's delta batch) into the
    * state the full recompute would produce. The 100 TB contract: a
    * nightly pipeline re-aggregates only the delta and folds it in,
    * never rescanning the base. Works for any commutative-monoid
    * measure; averages etc. derive from (sum, count) at read time.
    * Sums over DECIMAL stay exact under any merge order. */
  def mergeAggState(
      states: Seq[DataFrame], keys: Seq[String], measures: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state frame")
    val aggs = measures.map(m => sum(col(m)).as(m))
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
