package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches as relational operators.
  *
  * A count-min sketch is a (depth x width) counter grid; each input row
  * increments one cell per hash row. Built as a hash AGGREGATE over
  * (row, cell) — partial aggregation per partition IS sketch merging, so
  * the shuffle carries at most depth*width cells per partition regardless
  * of input size: the canonical mergeable-summary shape for 100 TB streams
  * (Cormode & Muthukrishnan 2005).
  *
  * Hashes are md5-derived ([[Dedup.md5Int]] of `"{row}:{key}"`), so any
  * engine with md5 reproduces the sketch bit-for-bit — estimates are
  * deterministic, never seeded.
  */
object Sketches {

  private def cell(row: Column, key: Column, width: Int): Column =
    pmod(Dedup.md5Int(concat(row.cast("string"), lit(":"), key.cast("string"))),
      lit(width))

  /** Build the sketch: one (row, cell, cnt) tuple per non-empty cell —
    * at most depth*width rows total. */
  def countMinSketch(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame =
    df.select(key.cast("string").as("__k"))
      .select(col("__k"), explode(sequence(lit(0), lit(depth - 1))).as("__r"))
      .groupBy(col("__r"), cell(col("__r"), col("__k"), width).as("__c"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for `keys` against a built sketch: the count-min
    * estimate is min over hash rows of the addressed cell — an upper
    * bound on the true count (collisions only inflate). The sketch is
    * depth*width rows -> broadcast; keys fan out depth ways then hash-agg
    * back, so the query side never shuffles the sketch. */
  def countMinEstimate(
      sketch: DataFrame, keys: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame = {
    val fanned = keys
      .withColumn("__r", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("__c", cell(col("__r"), key.cast("string"), width))
    fanned.join(broadcast(sketch), Seq("__r", "__c"), "left")
      .groupBy(keys.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_estimate"))
  }

  /** Sketch-based equi-join cardinality estimate (Cormode & Muthukrishnan
    * 2005 §4.2): |A ⋈ B| = <fA, fB>, the inner product of the two sides'
    * key-frequency vectors, estimated per hash row as sum_c a[r][c]*b[r][c]
    * and upper-bounded by taking the min over rows (collisions only ADD
    * mass, so every row's estimate >= the true size).
    *
    * The planner use case at 100 TB: both sketches are depth*width-row
    * aggregates (partial agg = sketch merge — each side is one pass, the
    * shuffle carries at most depth*width cells per partition), the
    * row-product join touches only grid cells, and NO join of the actual
    * tables ever runs. Returns one row: (est_join_rows). */
  def joinSizeEstimate(
      a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
      depth: Int, width: Int): DataFrame = {
    val sa = countMinSketch(a, aKey, depth, width)
    val sb = countMinSketch(b, bKey, depth, width)
      .withColumnRenamed("cnt", "cnt_b")
    sa.join(sb, Seq("__r", "__c")) // absent cells contribute 0 to the dot product
      .groupBy(col("__r"))
      .agg(sum(col("cnt") * col("cnt_b")).as("row_est"))
      .agg(min(col("row_est")).as("est_join_rows"))
  }
}
