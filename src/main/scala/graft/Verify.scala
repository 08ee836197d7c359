package graft

import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // same session config as Bench/PlanCheck (AQE, UTC, extensions):
    // correctness must be measured under the configuration we ship
    val spark = GraftSession.getOrCreate("graft-verify")
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated filter for fast local iteration on a
    // single query (same contract as Bench's SPARK_GRAFT_ONLY).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(q => names(q._1))
      case None        => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // free per-query persisted/localCheckpoint blocks
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // With the ONLY filter active, restrict the oracle dump to the selected
    // names: otherwise a reused outDir holds stale dumps that compare as
    // current, and a fresh one reports every unselected query as missing —
    // either way a partial run could masquerade as the full gate.
    val selectedNames = selected.map(_._1).toSet
    if (only.isDefined)
      System.err.println(
        s"[verify] SPARK_GRAFT_ONLY active — PARTIAL run (${selectedNames.size}/${SparkEntry.queries.size} queries); oracle_sql.json restricted to the selection")
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selectedNames(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
