package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "bal")

  private def apply(log: org.apache.spark.sql.DataFrame) =
    Cdc.applyChangelog(base, log, "k",
      col("lk"), col("seq"), col("op"), Seq("bal" -> col("val")))
      .select(col("k"), col("name"), col("bal"))
      .as[(Long, Option[String], Option[Double])].collect().toSet

  test("latest change per key wins; tombstones drop; untouched pass through") {
    val log = Seq(
      (1L, 1L, "U", 11.0), (1L, 2L, "U", 12.0), // two updates: seq 2 wins
      (2L, 3L, "D", 0.0),                       // tombstone
      (4L, 4L, "U", 40.0)                       // insert (not in base)
    ).toDF("lk", "seq", "op", "val")
    assert(apply(log) == Set(
      (3L, Some("c"), Some(30.0)),   // untouched, keeps all columns
      (1L, None, Some(12.0)),        // updated: payload col set, name nulled
      (4L, None, Some(40.0))))       // inserted
  }

  test("delete-then-reinsert: the later seq resurrects the key") {
    val log = Seq((2L, 1L, "D", 0.0), (2L, 2L, "U", 25.0))
      .toDF("lk", "seq", "op", "val")
    assert(apply(log).contains((2L, None, Some(25.0))))
  }

  test("re-applying the same log is idempotent on the snapshot") {
    val log = Seq((1L, 1L, "U", 99.0), (3L, 2L, "D", 0.0))
      .toDF("lk", "seq", "op", "val")
    val once = Cdc.applyChangelog(base, log, "k",
      col("lk"), col("seq"), col("op"), Seq("bal" -> col("val")))
    val twice = Cdc.applyChangelog(once, log, "k",
      col("lk"), col("seq"), col("op"), Seq("bal" -> col("val")))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("empty log returns the base unchanged") {
    val log = Seq.empty[(Long, Long, String, Double)].toDF("lk", "seq", "op", "val")
    assert(apply(log) ==
      Set((1L, Some("a"), Some(10.0)), (2L, Some("b"), Some(20.0)), (3L, Some("c"), Some(30.0))))
  }
}
