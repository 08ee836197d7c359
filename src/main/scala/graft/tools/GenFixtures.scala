package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.GraftSession

/** One-off fixture generator: writes the Spark-tokenized raw twin of
  * `fixtures/s1_cert.csv` as a single committed parquet file.
  *
  * Why a parquet twin exists at all: the s1 oracle originally re-parsed
  * the CSV with DuckDB's `read_csv`, which made the correctness gate
  * sensitive to the *oracle engine's* CSV dialect sniffer (two driver
  * rounds failed hash-only on the same bytes that pass locally).
  * Parquet reads are stable across DuckDB versions, so the oracle reads
  * this committed tokenization instead, and `IngestSpec` pins Spark's
  * CSV parse to the same bytes at test time.
  *
  * Regenerate (only when the CSV fixture changes):
  *   tools/run_main.sh graft.tools.GenFixtures   # or via java -cp, see run_verify.sh
  */
object GenFixtures {
  def main(args: Array[String]): Unit = {
    val root = sys.env.getOrElse("SPARK_GRAFT_REPO_DIR", "/root/repo")
    val spark = GraftSession.getOrCreate("graft-fixtures")
    val tmp = Files.createTempDirectory("s1raw").toString
    graft.domain.Ingest.readRawCsv(spark, s"$root/fixtures/s1_cert.csv")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
    Files.copy(Paths.get(part), Paths.get(s"$root/fixtures/s1_cert_raw.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $root/fixtures/s1_cert_raw.parquet")
    spark.stop()
  }
}
