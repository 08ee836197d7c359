package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the last step of every real
  * dedup pipeline: near-dup PAIRS (minhash/simhash/embedding blocking)
  * become CLUSTERS, and one canonical representative survives per
  * cluster.
  *
  * Algorithm: iterative min-label propagation (each node repeatedly
  * adopts the smallest label among itself and its neighbors) — the
  * standard shuffle-based formulation for graphs too big for one machine.
  * Each round is one join + one hash aggregate keyed on node id;
  * convergence takes O(component diameter) rounds, and near-dup graphs
  * are piles of small dense clusters, so a handful. The per-round driver
  * `count()` reads ONE aggregated number (convergence check), not data.
  */
object Components {

  /** Simplified PageRank (the original non-normalized formulation:
    * `r' = (1-d) + d * Σ_in r/outdeg`, no dangling-mass redistribution)
    * over a directed edge list, for a FIXED number of iterations —
    * influence/centrality scoring for corpus link graphs or entity
    * graphs.
    *
    * Determinism: every iteration rounds ranks at 9 decimals, so the
    * next iteration's input — and therefore the whole fixed-point
    * trajectory — replays identically in any engine that can do the
    * same join + grouped sum (the k-means playbook applied to graphs).
    *
    * Scale shape: out-degrees are one hash aggregate; each iteration is
    * one equi join of ranks to edges (shuffle on node id) plus one
    * grouped sum with map-side partials. Nothing collects to the
    * driver; the lineage grows linearly in `iters`, which is a small
    * constant by contract (pass a materializer for long runs). */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).cast("double").as("outdeg"))
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.select(col("node").as("src"), col("rank")), Seq("src"))
        .join(outDeg, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("in_sum"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) + lit(damping) * coalesce(col("in_sum"), lit(0.0)), 9)
            .as("rank"))
    }
    ranks
  }

  /** `pairs` must carry two long-typed id columns `a` and `b` (undirected
    * edges). Returns (node, component) where component = the smallest node
    * id in the cluster — so `node === component` marks the canonical
    * representative. Nodes not present in any pair are absent (singleton
    * clusters are the identity mapping; callers left-join and coalesce).
    *
    * Per-round label frames route through [[graft.Mat]]: the single-JVM
    * default is localCheckpoint, but on a real cluster set
    * `SPARK_GRAFT_MAT=persist` — a localCheckpoint block lost with its
    * executor cannot be recomputed (it IS the lineage root), so one
    * executor failure mid-convergence would kill the whole run. */
  def connectedComponents(
      pairs: DataFrame, a: String, b: String, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(a).cast("long").as("src"), col(b).cast("long").as("dst"))
    val sym = edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = graft.Mat(sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("node").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src").as("node")).agg(min(col("label")).as("nbr"))
      val prev = labels
      val next = graft.Mat(labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"),
          (col("nbr") < col("label")).as("__chg")))
      converged = {
        val r = next.agg(sum(when(col("__chg"), 1).otherwise(0))).first()
        r.isNullAt(0) || r.getLong(0) == 0L // null sum = empty graph
      }
      prev.unpersist(false) // next is materialized; drop the old round's blocks
      labels = next.drop("__chg")
      i += 1
    }
    sym.unpersist(false)
    labels.withColumnRenamed("label", "component")
  }

  /** Per-vertex triangle counts by degree-ordered orientation (the
    * distributed-triangle-counting standard, e.g. Suri & Vassilvitskii's
    * MR "compact-forward"): orient every undirected edge from its
    * lower-(degree, id) endpoint to the higher, enumerate wedges by
    * joining oriented edges head-to-tail, and close them with ONE
    * two-column equi join — the (degree, id) order is total and
    * transitive, so a triangle's closing edge can only be oriented
    * x -> z, and every triangle is found exactly once.
    *
    * Scale shape: orientation bounds every vertex's out-degree by
    * O(sqrt(m)), so the wedge join — the only superlinear step — is
    * sum(outdeg^2) <= m^1.5 instead of sum(deg^2), which a hub vertex
    * makes quadratic. All joins are equi; no driver loops.
    *
    * Input may contain duplicates, self-loops, or either edge direction;
    * it is canonicalized first. Output: (vertex, n_tri) for every vertex
    * in at least one triangle. */
  def triangleCounts(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    val e0 = edges
      .select(least(src, dst).cast("long").as("u"),
        greatest(src, dst).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e0.select(col("u").as("x")).unionAll(e0.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val o = e0
      .join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
      .select(when(fwd, col("u")).otherwise(col("v")).as("s"),
        when(fwd, col("v")).otherwise(col("u")).as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wedges = o.as("a").join(o.as("b"), col("a.t") === col("b.s"))
      .select(col("a.s").as("x"), col("a.t").as("y"), col("b.t").as("z"))
    val tris = wedges
      .join(o.select(col("s").as("x"), col("t").as("z")), Seq("x", "z"))
    tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("vertex"))
      .groupBy(col("vertex")).agg(count(lit(1)).as("n_tri"))
  }
}
