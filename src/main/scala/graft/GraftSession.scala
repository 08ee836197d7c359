package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuned for the harness (single JVM, `local[32]`) but every setting is the
  * one we'd want on a real cluster too: AQE on (runtime re-plan, skew-join
  * splitting), shuffle partitions sized to parallelism instead of the 200
  * default, UTC session time zone for oracle parity.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // local[32] with modest data: AQE's default 64m advisory size can
      // coalesce mid-size shuffles below core count; 8m keeps heavy
      // per-row stages (hashing, sketching) parallel. On a real cluster
      // this follows executor count instead.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      // runtime bloom join filters: on selective shuffle joins the build
      // side's bloom prefilters the probe side's scan — the automatic
      // form of Joins.bloomSemiJoin (explicit default in case a deploy
      // profile flips it)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
