package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shadow-compare harness: the user-facing twin of the reference's
  * SQL-vs-TypeScript builder comparison (`docs/TESTING-GUIDE.md:220-252`),
  * generalized from "two hardcoded staging tables" to any two
  * implementation variants of the same pipeline stage. Per entity it
  * reports both variants' row counts, the signed/percent count delta with
  * the reference's ±tolerance verdict, and — stronger than the
  * reference's count-only compare — a row-level reconciliation on the
  * entity's natural key: keys present in only one variant and shared keys
  * whose value multiset differs.
  *
  * Scale posture: each side collapses to one row per natural key via a
  * hash aggregate (count + order-independent XOR of a row value hash), so
  * the full-outer reconciliation join carries key-cardinality rows, never
  * raw duplicates; the per-entity verdict is a single-pass aggregate over
  * that join. Nothing is collected to the driver.
  */
object ShadowCompare {

  /** One compared entity: the two variant frames, the natural key the
    * reconciliation joins on (need not be unique — multiplicities are
    * compared per key), and the value columns whose per-key multiset must
    * match for the key to count as reconciled. */
  case class Entity(name: String, a: DataFrame, b: DataFrame,
                    keys: Seq[String], valueCols: Seq[String])

  def report(entities: Seq[Entity], tolerancePct: Double = 5.0): DataFrame = {
    require(entities.nonEmpty, "ShadowCompare.report: no entities")
    val perEntity = entities.map { e =>
      // per-key digest of each side: row count + XOR of a per-row value
      // hash (order-independent, no overflow under ANSI arithmetic).
      // Hash inputs are cast to string so both variants canonicalize
      // identically regardless of physical type quirks.
      def digest(df: DataFrame, tag: String) =
        df.groupBy(e.keys.map(col): _*)
          .agg(
            count(lit(1)).as(s"${tag}_rows"),
            expr("bit_xor(__vh)").as(s"${tag}_sig"))
      def withHash(df: DataFrame) = df.withColumn("__vh",
        xxhash64((e.keys ++ e.valueCols).map(c => col(c).cast("string")): _*))
      val joined = digest(withHash(e.a), "a")
        .join(digest(withHash(e.b), "b"), e.keys, "full_outer")
      joined.agg(
        coalesce(sum(coalesce(col("a_rows"), lit(0L))), lit(0L)).as("a_count"),
        coalesce(sum(coalesce(col("b_rows"), lit(0L))), lit(0L)).as("b_count"),
        coalesce(sum(when(col("b_rows").isNull, 1L).otherwise(0L)), lit(0L))
          .as("a_only_keys"),
        coalesce(sum(when(col("a_rows").isNull, 1L).otherwise(0L)), lit(0L))
          .as("b_only_keys"),
        coalesce(sum(when(col("a_rows").isNotNull && col("b_rows").isNotNull &&
            (col("a_rows") =!= col("b_rows") || col("a_sig") =!= col("b_sig")),
          1L).otherwise(0L)), lit(0L)).as("mismatched_keys"))
        .select(lit(e.name).as("entity"), col("a_count"), col("b_count"),
          col("a_only_keys"), col("b_only_keys"), col("mismatched_keys"))
    }
    perEntity.reduce(_.unionByName(_))
      .withColumn("diff", col("a_count") - col("b_count"))
      .withColumn("pct_diff", round(
        (col("a_count") - col("b_count")) * lit(100.0) /
          greatest(col("b_count"), lit(1L)), 4))
      .withColumn("within_tol", abs(col("pct_diff")) <= lit(tolerancePct))
      .withColumn("identical",
        col("a_only_keys") === 0L && col("b_only_keys") === 0L &&
          col("mismatched_keys") === 0L && col("diff") === 0L)
  }
}
