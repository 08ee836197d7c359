package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Embedding clustering for corpus organization (topic bucketing, diversity
  * sampling, cluster-balanced training mixes).
  *
  * Lloyd's k-means with cosine assignment, fully deterministic:
  *
  *  - seed centroids are the lowest-id vector per id-residue class (the
  *    same RNG-free scheme as `Similarity.ivfCosineTopK`), so every run —
  *    and every engine replicating the recipe — starts identically;
  *  - assignment ranks on the ROUNDED similarity with a cell-id tiebreak,
  *    so float noise at the 7th decimal cannot flip a point's cell across
  *    engines or fold orders;
  *  - centroid updates are element-wise means rounded at 6 decimals, so
  *    the next iteration's input is identical on both sides of the oracle.
  *
  * Scale shape (100 TB stance): centroids are k x dim — configuration-
  * sized — and are broadcast every iteration; the corpus is touched once
  * per iteration with a narrow cross join against the broadcast (k rows)
  * followed by one shuffle on (cell, pos) for the mean. Nothing collects
  * to the driver; iteration count is a small constant (the caller's
  * convergence budget), so the lineage stays shallow.
  */
object Clustering {

  private def cosineCol(df: DataFrame)(a: Column, b: Column): Column =
    if (df.sparkSession.catalog.functionExists("cosine_sim"))
      VectorFunctions.cosineNative(a, b)
    else VectorFunctions.cosine(a, b)

  /** Deterministic seeds: lowest-id vector per `id % k` class. */
  private def seedCentroids(points: DataFrame, k: Int): DataFrame =
    Joins.top1PerGroup(
      points.withColumn("cell", pmod(col("__id"), lit(k))),
      Seq(col("cell")), Seq(col("__id")))
      .select(col("cell"), col("__v").as("centroid"))

  /** Nearest-centroid assignment: rounded cosine, cell-asc tiebreak. */
  private def assign(points: DataFrame, centroids: DataFrame): DataFrame =
    Joins.top1PerGroup(
      points.crossJoin(broadcast(centroids))
        .withColumn("cos", round(cosineCol(points)(col("__v"), col("centroid")), 6)),
      Seq(col("__id")), Seq(col("cos").desc, col("cell").asc))
      .select(col("__id"), col("__v"), col("cell"), col("cos"))

  /** Element-wise mean of each cell's members, rounded at 6 decimals and
    * re-assembled in position order. The explode shuffles on (cell, pos)
    * with map-side partial sums; the re-assembly runs over k x dim rows —
    * configuration-sized, so the interpreted HOF there is irrelevant. */
  private def meanCentroids(assigned: DataFrame): DataFrame =
    assigned.select(col("cell"), posexplode(col("__v")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(round(avg(col("x")), 6).as("m"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** K-means assignment after `iters` Lloyd iterations: one row per input
    * point with its final cluster and rounded similarity to the final
    * centroid. `id` must be a non-null integral column unique per row. */
  def kMeansAssign(
      df: DataFrame, id: Column, vec: Column,
      k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    val points = df.select(id.cast("long").as("__id"),
      VectorFunctions.toDoubleArray(vec).as("__v"))
    var centroids = seedCentroids(points, k)
    for (_ <- 1 to iters)
      centroids = meanCentroids(assign(points, centroids))
    assign(points, centroids)
      .select(col("__id").as("point_id"), col("cell").as("cluster"), col("cos"))
  }

  /** Per-cluster summary of [[kMeansAssign]]: size and mean similarity of
    * members to their centroid (a compactness measure). */
  def kMeansSummary(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"),
        round(avg(col("cos")), 6).as("mean_cos"))
}
