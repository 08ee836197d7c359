package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Idempotent export (SURVEY §2.1 S8): insert-if-not-exists with key
  * validation and exclusion filtering, the pattern of the reference's 30+
  * export scripts (`sql/export/07-export-proposals.sql:12-73`).
  *
  * Relational form: left-anti join against the target's existing keys
  * (idempotence), left-semi against a referenced dimension (FK validity),
  * left-anti against an exclusion list. At scale the target-keys frame is
  * a column-pruned scan of the sink table; appends stay deterministic so
  * re-runs converge.
  */
object Export {

  def upsertCandidates(
      source: DataFrame, existingKeys: DataFrame, keyCols: Seq[String]): DataFrame =
    source.join(existingKeys.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")

  def validateFk(
      source: DataFrame, dim: DataFrame, fkCol: String, dimKeyCol: String): DataFrame =
    source.join(dim.select(col(dimKeyCol)).distinct(),
      source(fkCol) === dim(dimKeyCol), "left_semi")

  def applyExclusions(
      source: DataFrame, exclusions: DataFrame, keyCol: String, exclCol: String): DataFrame =
    source.join(broadcast(exclusions.select(col(exclCol)).distinct()),
      source(keyCol) === exclusions(exclCol), "left_anti")

  /** Full export shape: exclusions -> FK validation -> anti-join append set. */
  def exportSet(
      source: DataFrame, existingKeys: DataFrame, keyCols: Seq[String],
      fkDim: Option[(DataFrame, String, String)] = None,
      exclusions: Option[(DataFrame, String, String)] = None): DataFrame = {
    val afterExcl = exclusions.map { case (e, k, ek) => applyExclusions(source, e, k, ek) }
      .getOrElse(source)
    val afterFk = fkDim.map { case (d, fk, dk) => validateFk(afterExcl, d, fk, dk) }
      .getOrElse(afterExcl)
    upsertCandidates(afterFk, existingKeys, keyCols)
  }
}
