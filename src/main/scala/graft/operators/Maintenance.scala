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
}
