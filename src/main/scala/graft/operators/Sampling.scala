package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * All sampling here is HASH-based, never RNG-based: the kept set is a pure
  * function of the row's id (plus an optional salt), so a sample is
  * reproducible across runs, executors, retries and engines — `sample()`
  * with a seed is only stable for a fixed partitioning, which no 100 TB
  * pipeline should rely on. Sampling is a filter (no shuffle); stratified
  * rates join against a configuration-sized frame (broadcast by AQE).
  */
object Sampling {

  /** Number of hash buckets the id space is folded into: rates are
    * resolved to `floor(rate * buckets)` kept buckets, so the effective
    * rate granularity is 1/buckets. */
  val DefaultBuckets = 10000

  /** The row's sampling bucket in [0, buckets): first 8 md5 hex digits of
    * (id, salt) as an integer, mod buckets — replicable in any engine with
    * md5 (same trick as [[Dedup.md5Int]]). */
  def sampleBucket(id: Column, salt: String = "", buckets: Int = DefaultBuckets): Column =
    pmod(Dedup.md5Int(concat(id.cast("string"), lit(salt))), lit(buckets))

  /** Uniform deterministic sample: keeps ~`rate` of rows. */
  def hashSample(
      df: DataFrame, id: Column, rate: Double,
      salt: String = "", buckets: Int = DefaultBuckets): DataFrame =
    df.filter(sampleBucket(id, salt, buckets) < math.floor(rate * buckets).toLong)

  /** Stratified deterministic sample for training-mix construction:
    * `rates` is a (stratum, rate) configuration frame; each row is kept
    * when its bucket falls under its stratum's rate. Strata missing from
    * `rates` are dropped (rate 0). The rates frame is configuration-sized
    * -> AQE broadcasts the join; the fact side never shuffles. */
  def stratifiedSample(
      df: DataFrame, stratum: Column, id: Column, rates: DataFrame,
      salt: String = "", buckets: Int = DefaultBuckets): DataFrame = {
    val r = rates.select(col("stratum").as("__stratum"),
      floor(col("rate") * buckets).cast("long").as("__keep"))
    df.join(r, stratum === col("__stratum"), "inner")
      .filter(sampleBucket(id, salt, buckets) < col("__keep"))
      .drop("__stratum", "__keep")
  }

  /** Deterministic per-group top-k sample ("reservoir-shaped" without the
    * RNG): rank rows inside each group by their sample bucket (id as the
    * tiebreak makes the order total) and keep the first k. Equivalent to a
    * uniform k-row draw per group, but reproducible; one shuffle on the
    * group key. */
  def groupSample(
      df: DataFrame, group: Seq[Column], id: Column, k: Int,
      salt: String = "", buckets: Int = DefaultBuckets): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group: _*)
      .orderBy(sampleBucket(id, salt, buckets), id)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }
}
