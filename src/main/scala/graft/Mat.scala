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
  def apply(df: DataFrame): DataFrame = sys.env.get("SPARK_GRAFT_MAT") match {
    case Some("persist") =>
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count() // eager: a lazy persist consumed by two branches of one
      p         // action computes twice before the cache fills
    case Some("none") => df
    case _ => df.localCheckpoint(true)
  }
}
