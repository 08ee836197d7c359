package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.functions.Cleaning
import graft.operators.Routing

/** Raw CSV ingest (SURVEY §2.1 S1/S2/S4/S5).
  *
  * The reference loads CSVs into all-NVARCHAR tables
  * (`scripts/load-csv.ts:191-296`; `sql/01-raw-tables.sql:4-5`), routes
  * files to tables by filename prefix (`scripts/ingest-raw-data.ts`,
  * mapping at `DATA-FLOW-EXPLAINED.md:294-305`), then types everything in
  * one trim+try-cast pass (`sql/02-input-tables.sql:237-267`) with a
  * conformance gate quarantining rows with missing keys (`:319-348`).
  *
  * Here: an all-string CSV read (header on), the same prefix routing map,
  * and a declarative cast pass driven by a (name -> type) spec so the
  * whole thing stays one codegen'd projection over the scan.
  */
object Ingest {

  /** Filename-prefix -> logical table routing
    * (`DATA-FLOW-EXPLAINED.md:294-305`). */
  val tableRouting: Seq[(String, String)] = Seq(
    "CommissionsDetail" -> "raw_commissions_detail",
    "CertificateInfo"   -> "raw_certificate_info",
    "Premiums"          -> "raw_premiums",
    "ScheduleRates"     -> "raw_schedule_rates",
    "PerfGroups"        -> "raw_perf_groups",
    "IndividualBrokers" -> "raw_individual_brokers",
    "OrgBrokers"        -> "raw_org_brokers",
    "Licenses"          -> "raw_licenses",
    "EOInsurance"       -> "raw_eo_insurance",
    "Fees"              -> "raw_fees",
  )

  def routeFile(fileName: String): Option[String] =
    tableRouting.collectFirst {
      case (prefix, table) if fileName.startsWith(prefix) => table
    }

  /** All-string CSV scan — the raw layer is deliberately untyped
    * (`sql/01-raw-tables.sql:4-5`); typing is a separate, testable pass. */
  def readRawCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false") // everything NVARCHAR-equivalent
      .csv(path)

  /** Column spec for the typed pass: (rawName, outName, sqlType). A null
    * sqlType keeps the (trimmed) string. */
  type CastSpec = Seq[(String, String, String)]

  /** Typed cast pass (S4): trim + null-empty + try_cast every column
    * (`sql/02-input-tables.sql:237-267`). */
  def typedPass(raw: DataFrame, spec: CastSpec): DataFrame =
    raw.select(spec.map { case (rawName, outName, sqlType) =>
      val cleaned = Cleaning.cleanStr(col(rawName))
      (if (sqlType == null) cleaned else cleaned.try_cast(sqlType)).as(outName)
    }: _*)

  /** Conformance gate (S5): rows with null required keys -> quarantine
    * with per-column reason flags (`sql/02-input-tables.sql:319-348`). */
  def gate(typed: DataFrame, requiredKeys: Seq[String]): (DataFrame, DataFrame) =
    Routing.conformanceGate(typed, requiredKeys)

  /** Certificate-info spec (`sql/02-input-tables.sql:94-119`). */
  val certificateSpec: CastSpec = Seq(
    ("CertificateId", "cert_id", "bigint"),
    ("GroupId", "group_id", null),
    ("Product", "product_code", null),
    ("PlanCode", "plan_code", null),
    ("CertEffectiveDate", "eff_date", "date"),
    ("CertIssuedState", "state", null),
    ("CertStatus", "cert_status", null),
    ("RecStatus", "rec_status", null),
    ("CertPremium", "premium", "decimal(18,2)"),
    ("CertSplitSeq", "split_seq", "int"),
    ("CertSplitPercent", "split_pct", "decimal(5,2)"),
    ("SplitBrokerSeq", "tier_level", "int"),
    ("SplitBrokerId", "broker_id", null),
    ("PaidBrokerId", "paid_broker_id", null),
    ("CommissionsSchedule", "schedule_code", null),
  )

  /** Active-row predicate (P3): `RecStatus='A' AND CertStatus='A'`
    * (`sql/02-input-tables.sql:266-267`; `proposal-builder.ts:2145-2147`). */
  def activeOnly(typedCerts: DataFrame): DataFrame =
    typedCerts.filter(col("rec_status") === "A" && col("cert_status") === "A")
}
