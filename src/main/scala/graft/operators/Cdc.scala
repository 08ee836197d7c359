package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture application: the MERGE INTO of the lakehouse
  * engines, expressed as pure DataFrame algebra (no table-format
  * dependency).
  *
  * Semantics: the changelog carries (key, seq, op, payload) with op in
  * {I/U, D} and `seq` a total order per key (CDC readers guarantee this —
  * an LSN / binlog position). The LATEST change per key wins:
  *   - op = D: the key is tombstoned — dropped from the result;
  *   - op = I/U: the key takes the change's payload (insert-or-update —
  *     membership in the base is irrelevant, which is exactly MERGE's
  *     WHEN [NOT] MATCHED collapse);
  *   - keys untouched by the log pass through from the base.
  *
  * Scale shape: one window over the LOG (sized by the change volume, not
  * the base), then a left-anti join + union — the base table is touched
  * by a single equi join on the key. This is the idempotent-snapshot
  * maintenance loop: re-applying the same log converges (the reference's
  * export upsert, S8, is the insert-only special case).
  */
object Cdc {

  /** Apply `log` to `base`.
    *
    * @param keyCol  key column NAME in the base (the upserted key lands
    *                in this column of the result)
    * @param payload base column name -> log expression with its
    *                post-change value; base columns absent from the map
    *                survive only on untouched rows (changed rows emit
    *                null for them — a CDC feed that doesn't carry a
    *                column can't preserve it through an update)
    */
  def applyChangelog(
      base: DataFrame, log: DataFrame, keyCol: String,
      logKey: Column, seq: Column, op: Column,
      payload: Seq[(String, Column)]): DataFrame = {
    val l = log.select(Seq(logKey.as("__k"), seq.as("__seq"), op.as("__op")) ++
      payload.map { case (n, c) => c.as(s"__p_$n") }: _*)
    val latest = Joins.top1PerGroup(l, Seq(col("__k")), Seq(col("__seq").desc))
    val baseCols = base.columns.toSeq
    val upserts = latest.filter(col("__op") =!= "D").select(baseCols.map { c =>
      if (c == keyCol) col("__k").cast(base.schema(c).dataType).as(c)
      else payload.find(_._1 == c) match {
        case Some(_) => col(s"__p_$c").cast(base.schema(c).dataType).as(c)
        case None    => lit(null).cast(base.schema(c).dataType).as(c)
      }
    }: _*)
    // anti side needs only the SET of logged keys — a distinct, not the
    // windowed top-1 (whose subplan would otherwise compute twice: once
    // per union branch; window sort > hash distinct on the log besides)
    val untouched = base.join(l.select(col("__k")).distinct(),
      base(keyCol) === col("__k"), "left_anti")
    untouched.select(baseCols.map(col): _*).unionByName(upserts)
  }
}
