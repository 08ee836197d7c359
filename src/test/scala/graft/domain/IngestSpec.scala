package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("filename routing map matches prefixes incl. multi-file globs") {
    assert(Ingest.routeFile("CommissionsDetail_2024_01.csv").contains("raw_commissions_detail"))
    assert(Ingest.routeFile("CertificateInfo.csv").contains("raw_certificate_info"))
    assert(Ingest.routeFile("Unknown.csv").isEmpty)
  }

  test("csv -> all-string raw -> typed pass -> gate, end to end") {
    val dir = Files.createTempDirectory("graft_ingest").toFile
    val csv =
      """CertificateId,GroupId,Product,PlanCode,CertEffectiveDate,CertIssuedState,CertStatus,RecStatus,CertPremium,CertSplitSeq,CertSplitPercent,SplitBrokerSeq,SplitBrokerId,PaidBrokerId,CommissionsSchedule
        |1001, 25992 ,PRODA,PL1,2020-01-15,TX,A,A,1234.56,1,100.00,1, P13178 ,P13178,SCHED1
        |1002,,PRODB,PL2,2020-02-15,CA,A,A,bogus,1,100.00,1,P2,P2,SCHED1
        |1003,G7,PRODC,PL3,2020-03-15,NY,T,A,10.00,1,100.00,1,P3,P3,SCHED1
        |""".stripMargin
    Files.writeString(new java.io.File(dir, "CertificateInfo.csv").toPath, csv)
    val raw = Ingest.readRawCsv(spark, dir.getAbsolutePath)
    assert(raw.schema.fields.forall(_.dataType.typeName == "string")) // raw layer untyped
    val typed = Ingest.typedPass(raw, Ingest.certificateSpec)
    val active = Ingest.activeOnly(typed) // drops 1003 (CertStatus T)
    assert(active.count() == 2)
    val (ok, quarantined) = Ingest.gate(active, Seq("cert_id", "group_id"))
    assert(ok.count() == 1)          // 1002 has empty GroupId -> quarantined
    assert(quarantined.count() == 1)
    val row = ok.select(col("cert_id"), col("group_id"), col("broker_id"),
      col("premium").cast("string")).as[(Long, String, String, String)].collect().head
    assert(row == ((1001L, "25992", "P13178", "1234.56"))) // trimmed + typed
    val badPremium = typed.filter(col("cert_id") === 1002)
      .select(col("premium")).collect().head.isNullAt(0)
    assert(badPremium) // try_cast: 'bogus' -> null, not an error
  }

  test("committed s1 fixture: CSV tokenization matches the raw parquet twin") {
    // The s1_csv_ingest oracle reads fixtures/s1_cert_raw.parquet (a
    // committed python-csv+pyarrow tokenization of fixtures/s1_cert.csv,
    // regen via tools/gen_s1_fixture.py) so the DuckDB gate is independent
    // of the oracle engine's CSV sniffer. Because the twin is written by a
    // NON-Spark tokenizer, this assertion independently verifies Spark's
    // CSV parse of the committed bytes, cell for cell (padding kept,
    // quoted commas unwrapped, empties as null).
    val root = sys.env.getOrElse("SPARK_GRAFT_REPO_DIR", "/root/repo")
    val csv = Ingest.readRawCsv(spark, s"$root/fixtures/s1_cert.csv")
    val twin = spark.read.parquet(s"$root/fixtures/s1_cert_raw.parquet")
    assert(csv.schema.fieldNames.toSeq == twin.schema.fieldNames.toSeq)
    assert(csv.count() == 1500 && twin.count() == 1500)
    assert(csv.exceptAll(twin).isEmpty && twin.exceptAll(csv).isEmpty)
  }
}
