package graft

import org.apache.spark.sql.DataFrame

/** Shared materializer for iterative/fan-in frames — the ONE place where
  * "truncate lineage here" policy lives, switched by `SPARK_GRAFT_MAT`:
  *
  *  - unset (default): `localCheckpoint(eager)` — right for a single JVM
  *    (truncates lineage, no recompute), but the checkpoint blocks live
  *    ONLY on executors: on a real cluster an executor loss mid-run kills
  *    the job, because a localCheckpoint cannot be recomputed from
  *    lineage (it IS the lineage root).
  *  - `persist`: eagerly-counted `persist(MEMORY_AND_DISK)` — survives
  *    executor loss (recompute from lineage) at the cost of keeping the
  *    lineage around. The right setting for a 1000-executor run.
  *  - `none`: no materialization — rely on ReuseExchange for identical
  *    subplans. Only for shallow plans / plan-shape inspection.
  *
  * Iterative operators (connected components, deep BPE) and the domain
  * pipeline's fan-in frames all route through here, so one env var moves
  * the whole engine between single-JVM and cluster-durable materialization.
  */
object Mat {
  /** Mode: the `graft.mat` system property (tests) falls back to the
    * `SPARK_GRAFT_MAT` env var (the driver's contract). */
  private def mode: Option[String] =
    sys.props.get("graft.mat").orElse(sys.env.get("SPARK_GRAFT_MAT"))

  def apply(df: DataFrame): DataFrame = mode match {
    case Some("persist") =>
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count() // eager: a lazy persist consumed by two branches of one
                // action computes twice before the cache fills
      // Re-root on the execution RDD: without this, iterative operators
      // nest each round's full catalyst plan inside the next round's and
      // analysis/optimization cost grows superlinearly in rounds (the
      // r13 persist sweep OOMed on 30-round BPE and the curation
      // composite at sf0.001 from plan size alone). The LogicalRDD leaf
      // truncates the SQL plan; the RDD underneath keeps its lineage, so
      // executor loss still recomputes instead of failing the job.
      org.apache.spark.sql.GraftPlanBridge.rddRoot(p)
    case Some("none") => df
    case _ => df.localCheckpoint(true)
  }

  /** Materialize `df` hash-partitioned on `keys` — AND KEEP THE LAYOUT
    * VISIBLE to the planner. Iterative operators join/aggregate their
    * materialized edge frames on the same key every round; plain
    * [[apply]] cannot help them because `Dataset.localCheckpoint` (and
    * `LogicalRDD.fromDataset`) capture outputPartitioning off the
    * adaptive root BEFORE the final plan exists, so the leaf comes back
    * `UnknownPartitioning` and every round re-exchanges it (probed on
    * 4.1.2 — see GraftPlanBridge.reRootKeyed). The partition count is
    * pinned to spark.sql.shuffle.partitions: an AQE-coalescible width
    * could never co-partition with the sibling exchanges of later joins.
    * Callers must only use this where results are partitioning-invariant
    * (graph rounds here are exact aggregates over exact joins). */
  def keyed(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val r = df.repartition(n, keys: _*)
    mode match {
      case Some("none") => r
      case Some("persist") =>
        val p = r.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        org.apache.spark.sql.GraftPlanBridge.reRootKeyed(p, localCkpt = false)
      case _ =>
        org.apache.spark.sql.GraftPlanBridge.reRootKeyed(r, localCkpt = true)
    }
  }
}
