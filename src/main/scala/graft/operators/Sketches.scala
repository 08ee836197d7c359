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
    // fan the single-column key frame out before the depth-way explode:
    // the md5 per (row, hash-row) otherwise runs inside the scan stage,
    // whose parallelism is the input's row-group count (1 for the local
    // fixtures) — results are exact cell counts, partitioning-invariant
    graft.Tables.fanOut(df.select(key.cast("string").as("__k")))
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

  /** KMV (k-minimum-values / bottom-k) distinct sketches with SET-ALGEBRA
    * readout — the theta-sketch capability HLL lacks: per set, keep the k
    * smallest md5-derived element hashes; any pair of sketches then
    * answers |A|, |B|, |A∪B| and |A∩B| WITHOUT touching the elements
    * again (Beyer et al., SIGMOD'07 / the Datasketches theta family).
    *
    * Estimates: D̂ = (k−1)·2^52 / h_(k) (unbiased bottom-k estimator;
    * exact count when the set is smaller than k); union = k-min over the
    * merged sketch; intersection by inclusion–exclusion; Jaccard from
    * the fraction of the union's k-min present in both sketches
    * (`jaccard_ppm`, an exact integer division).
    *
    * Scale + portability: hashes are 52-bit (13 md5 hex digits), so every
    * hash and every (k−1)·2^52 product is an exactly-representable
    * double — the estimate is ONE IEEE division, engine-replayable
    * (round 4). The sketch build is a typed O(k)-state aggregator
    * ([[graft.sql.BottomKLongsAggregator]] — map-side merge; the shuffle
    * carries k longs per set, never the set). Pairing is a self
    * cross-join of the SKETCH frame (one row per set — metadata-sized).
    *
    * Returns one row per unordered set pair: (set_a, set_b, exact_a,
    * exact_b, est_a, est_b, est_union, est_intersect, jaccard_ppm). */
  def kmvOverlap(
      df: DataFrame, setId: Column, element: Column, k: Int): DataFrame = {
    val el = df.select(setId.cast("string").as("sid"),
      element.cast("string").as("el")).distinct()
    val hashed = el.select(col("sid"),
      conv(substring(md5(col("el")), 1, 13), 16, 10).cast("long").as("h"))
    val bottomK = udaf(graft.sql.BottomKLongsAggregator(k))
    // one row per set: the sketch + the exact distinct size (the input
    // frame is already distinct, so count(*) is exact)
    val sk = hashed.groupBy(col("sid"))
      .agg(bottomK(col("h")).as("mins"), count(lit(1)).as("exact_n"))
    val two52 = 4503599627370496.0 // 2^52
    // 52-bit hash collisions can leave FEWER than k distinct hashes even
    // when the set has >= k distinct elements; element_at(mins, k) would
    // be null and silently null the whole estimate chain. Degrade to the
    // (j-1)/h_j estimator at the sketch's actual size j instead.
    def est(minsC: Column, exactC: Column): Column = {
      val j = size(minsC)
      when(exactC < k, exactC.cast("double")).otherwise(
        when(j < k,
          round((j - 1).cast("double") * lit(two52)
            / element_at(minsC, j).cast("double"), 4))
        .otherwise(round(lit((k - 1).toDouble * two52)
          / element_at(minsC, k).cast("double"), 4)))
    }
    val pairs = sk.as("a").crossJoin(sk.as("b"))
      .filter(col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("set_a"), col("b.sid").as("set_b"),
        col("a.exact_n").as("exact_a"), col("b.exact_n").as("exact_b"),
        col("a.mins").as("ma"), col("b.mins").as("mb"))
      .withColumn("merged",
        array_sort(array_distinct(concat(col("ma"), col("mb")))))
      .withColumn("kk", least(lit(k), size(col("merged"))))
      .withColumn("kmin", slice(col("merged"), 1, k))
    pairs
      .withColumn("est_a", est(col("ma"), col("exact_a")))
      .withColumn("est_b", est(col("mb"), col("exact_b")))
      .withColumn("est_union",
        when(size(col("merged")) < k, size(col("merged")).cast("double"))
          .otherwise(round(lit((k - 1).toDouble * two52)
            / element_at(col("merged"), k).cast("double"), 4)))
      .withColumn("n_common", size(filter(col("kmin"),
        x => array_contains(col("ma"), x) && array_contains(col("mb"), x))))
      .select(col("set_a"), col("set_b"), col("exact_a"), col("exact_b"),
        col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 4)
          .as("est_intersect"),
        expr("n_common * 1000000L div kk").as("jaccard_ppm"))
  }
}
