package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * One parquet directory per scale factor; columnar scans give us free
  * column pruning + predicate pushdown (the reference hand-wrote both into
  * every SELECT — see SURVEY.md §4).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The events fixture has shipped `ts` as both TIMESTAMP(NANOS) (reads
    * back as INT64 with `nanosAsLong`) and timestamp[us] (reads back as
    * TIMESTAMP_NTZ under the default NTZ inference) across driver
    * regenerations, so branch on the dtype actually read rather than
    * assuming either:
    *  - LongType → nanos; truncate to micros with integer `div` (a double
    *    division would lose precision at 1e18 nanos);
    *  - TIMESTAMP_NTZ → cast to session-TZ timestamp (session is pinned to
    *    UTC in GraftSession, so the wall-clock instant is preserved and
    *    matches what DuckDB reads from the same file);
    *  - already TimestampType → pass through. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
