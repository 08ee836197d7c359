package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-dependent interval algorithms.
  *
  * The reference's consolidation state machine
  * (`scripts/transforms/consolidate-proposals.ts:130-245`) and
  * overlapping-date fix (`scripts/proposal-builder.ts:1503+`) are
  * sequential scans over date-sorted rows per group. In Spark the scale
  * stance is: shuffle once by the group key, sort within the partition,
  * then run the per-group state machine via `flatMapGroups` — one group in
  * memory at a time, never the whole dataset on the driver (the reference
  * loads everything into one Node process; we do not).
  *
  * `mergeIntervals` is the distilled core of that family (gaps-and-islands).
  */
object Intervals {

  /** Merge overlapping/touching [from, to] intervals per key via a typed
    * per-group sequential scan. Inputs taken as epoch-millis timestamps.
    *
    * Output: key, range_from, range_to, n_merged.
    */
  def mergeIntervals(
      df: DataFrame, key: Column, from: Column, to: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(
      key.cast("long").as("k"),
      from.cast("timestamp").cast("long").as("f"),
      to.cast("timestamp").cast("long").as("t"))
      .as[(Long, Long, Long)]
    prepared
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val sorted = it.toArray.sortBy(r => (r._2, r._3))
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Int)]
        var curF = 0L; var curT = 0L; var n = 0
        sorted.foreach { case (_, f, t) =>
          if (n == 0) { curF = f; curT = t; n = 1 }
          else if (f <= curT) { curT = math.max(curT, t); n += 1 }
          else { out += ((k, curF, curT, n)); curF = f; curT = t; n = 1 }
        }
        if (n > 0) out += ((k, curF, curT, n))
        out.iterator
      }
      .toDF("key", "f", "t", "n_merged")
      .select(col("key"),
        col("f").cast("timestamp").as("range_from"),
        col("t").cast("timestamp").as("range_to"),
        col("n_merged"))
  }

  /** Coverage gaps: the holes BETWEEN a key's merged intervals — the
    * complement query of [[mergeIntervals]] (lapsed-coverage detection,
    * scheduling holes). One lead window over the merged frame, which is
    * already tiny relative to the input. */
  def coverageGaps(
      df: DataFrame, key: Column, from: Column, to: Column): DataFrame = {
    val merged = mergeIntervals(df, key, from, to)
    val w = Window.partitionBy(col("key")).orderBy(col("range_from"))
    merged
      .withColumn("__next_from", lead(col("range_from"), 1).over(w))
      .filter(col("__next_from").isNotNull)
      .select(col("key"),
        col("range_to").as("gap_from"),
        col("__next_from").as("gap_to"),
        datediff(col("__next_from").cast("date"), col("range_to").cast("date"))
          .cast("long").as("gap_days"))
  }

  /** Interval-overlap join WITHOUT a range join: both interval tables
    * explode into the fixed-width time buckets they span and join EQUI
    * on the bucket id; the true overlap predicate runs as a residual
    * filter (a shared bucket does NOT imply overlap), and pairs spanning
    * several buckets dedupe once. This is the standard trick for
    * interval x interval matching at scale — the naive formulation is a
    * range-predicate join Spark can only execute as a nested loop.
    * `bucketDays` trades replication (long intervals span more buckets)
    * against candidate precision; size it near the typical interval
    * length. */
  def overlapJoin(
      a: DataFrame, b: DataFrame,
      aId: Column, aFrom: Column, aTo: Column,
      bId: Column, bFrom: Column, bTo: Column,
      bucketDays: Int = 32): DataFrame = {
    def bucket(c: Column) = floor(unix_date(c.cast("date")) / bucketDays)
    val ab = a.select(aId.as("a_id"), aFrom.cast("date").as("a_from"),
        aTo.cast("date").as("a_to"))
      .withColumn("__bk", explode(sequence(bucket(col("a_from")), bucket(col("a_to")))))
    val bb = b.select(bId.as("b_id"), bFrom.cast("date").as("b_from"),
        bTo.cast("date").as("b_to"))
      .withColumn("__bk", explode(sequence(bucket(col("b_from")), bucket(col("b_to")))))
    ab.join(bb, Seq("__bk"))
      .filter(col("a_from") <= col("b_to") && col("b_from") <= col("a_to"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"),
        greatest(col("a_from"), col("b_from")).as("ov_from"),
        least(col("a_to"), col("b_to")).as("ov_to"))
      .withColumn("ov_days",
        (datediff(col("ov_to"), col("ov_from")) + 1).cast("long"))
  }

  /** Allen interval-algebra classification over co-occurring pairs: the
    * 11 relations an intersecting-or-touching pair can hold (equals,
    * starts/started_by, finishes/finished_by, during/contains,
    * meets/met_by, overlaps/overlapped_by). `before`/`after` are omitted
    * by design — they hold for almost every pair and would force an
    * all-pairs join; the co-occurrence restriction keeps this the same
    * bucketed equi join as [[overlapJoin]]. Closed [from, to] date
    * intervals; `meets` = a ends exactly where b starts.
    *
    * The case chain tests the equality-constrained relations first
    * (equals/starts/finishes), then containment, then the touching and
    * plain-overlap forms — each row matches exactly one relation.
    */
  def allenJoin(
      a: DataFrame, b: DataFrame,
      aId: Column, aFrom: Column, aTo: Column,
      bId: Column, bFrom: Column, bTo: Column,
      bucketDays: Int = 32): DataFrame = {
    val ab = a.select(aId.as("a_id"), aFrom.cast("date").as("a_from"),
        aTo.cast("date").as("a_to"))
      .withColumn("__bk", explode(sequence(
        floor(unix_date(col("a_from")) / bucketDays),
        floor(unix_date(col("a_to")) / bucketDays))))
    val bb = b.select(bId.as("b_id"), bFrom.cast("date").as("b_from"),
        bTo.cast("date").as("b_to"))
      .withColumn("__bk", explode(sequence(
        floor(unix_date(col("b_from")) / bucketDays),
        floor(unix_date(col("b_to")) / bucketDays))))
    ab.join(bb, Seq("__bk"))
      .filter(col("a_from") <= col("b_to") && col("b_from") <= col("a_to"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("relation",
        when(col("a_from") === col("b_from") && col("a_to") === col("b_to"), "equals")
          .when(col("a_from") === col("b_from") && col("a_to") < col("b_to"), "starts")
          .when(col("a_from") === col("b_from"), "started_by")
          .when(col("a_to") === col("b_to") && col("a_from") > col("b_from"), "finishes")
          .when(col("a_to") === col("b_to"), "finished_by")
          .when(col("a_from") > col("b_from") && col("a_to") < col("b_to"), "during")
          .when(col("a_from") < col("b_from") && col("a_to") > col("b_to"), "contains")
          .when(col("a_to") === col("b_from"), "meets")
          .when(col("b_to") === col("a_from"), "met_by")
          .when(col("a_from") < col("b_from"), "overlaps")
          .otherwise("overlapped_by"))
      .select(col("a_id"), col("b_id"), col("relation"))
  }

  /** Sessionize an event stream in batch: events for the same user that
    * are within `gapSeconds` of the previous event share a session.
    * Pure window-function formulation (gaps-and-islands) — no typed path
    * needed, stays in codegen.
    */
  def sessionize(
      events: DataFrame, user: Column, ts: Column, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(user).orderBy(ts)
    val withGap = events
      .withColumn("__prev", lag(ts, 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull ||
          // cast to double: fractional seconds count toward the gap
          ts.cast("double") - col("__prev").cast("double") > gapSeconds, 1).otherwise(0))
    withGap
      .withColumn("session_seq", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** SCD2 as-of snapshot: the rows of a versioned dimension effective at
    * `asOf` (`from <= asOf <= to`). With half-open or closed interval
    * conventions the caller picks the bound columns accordingly; this is
    * the closed-interval form the hierarchy-versioning family emits
    * (2099-01-01 open end). A pure filter — predicate-pushdown reaches
    * the scan, and on a dimension partitioned/z-ordered by `from` the
    * scan prunes to the files straddling `asOf`. */
  def snapshotAt(df: DataFrame, from: Column, to: Column, asOf: Column): DataFrame =
    df.filter(from <= asOf && to >= asOf)
}
