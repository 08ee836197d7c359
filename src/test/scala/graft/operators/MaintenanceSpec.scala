package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compactionPlan bins files by cumulative size in listing order, per partition") {
    // p1: sizes 60+50 fill bin 0 (cum-before 0, 60), 95 starts at cum 110
    // -> bin 1, 10 at cum 205 -> bin 2; the oversized 300 in p2 sits
    // alone in its bin and the next file starts a fresh one
    val files = Seq(
      ("p1", 1, 60L), ("p1", 2, 50L), ("p1", 3, 95L), ("p1", 4, 10L),
      ("p2", 1, 300L), ("p2", 2, 5L)
    ).toDF("part", "file", "size")
    val got = Maintenance.compactionPlan(
      files, col("part"), col("file"), col("size"), targetBytes = 100L)
      .select("part", "bin", "n_files", "total_bytes", "file_from", "file_to")
      .as[(String, Long, Long, Long, Int, Int)].collect().toSet
    assert(got == Set(
      ("p1", 0L, 2L, 110L, 1, 2),
      ("p1", 1L, 1L, 95L, 3, 3),
      ("p1", 2L, 1L, 10L, 4, 4),
      ("p2", 0L, 1L, 300L, 1, 1),
      ("p2", 3L, 1L, 5L, 2, 2)))
  }

  test("compactionPlan bin totals partition the inventory exactly") {
    val files = (1 to 200).map(i => ("p", i, (i * 37 % 90 + 10).toLong))
      .toDF("part", "file", "size")
    val plan = Maintenance.compactionPlan(
      files, col("part"), col("file"), col("size"), targetBytes = 256L)
    val (nf, tb) = plan.agg(sum("n_files"), sum("total_bytes"))
      .as[(Long, Long)].head()
    val want = files.agg(count(lit(1)), sum(col("size")))
      .as[(Long, Long)].head()
    assert((nf, tb) == want)
  }

  test("zoneMapPrune: overlap verdicts, sound matches, disjoint range prunes all") {
    // files 0/1/2 hold v in [0,9] / [10,19] / [20,29] (10 rows each)
    val rows = (0 until 30).map(v => (v / 10, v.toDouble)).toDF("f", "v")
    val got = Maintenance.zoneMapPrune(rows, col("f"), col("v"), Seq(
        ("mid", 12.0, 15.0), ("span", 8.0, 21.0), ("none", 100.0, 200.0)))
      .select(col("predicate"), col("n_files"), col("n_pruned"),
        col("rows_total"), col("rows_scanned"), col("rows_matched"),
        col("skip_frac"))
      .as[(String, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("mid") == (("mid", 3L, 2L, 30L, 10L, 4L, 0.666667)))
    assert(got("span") == (("span", 3L, 0L, 30L, 30L, 14L, 0.0)))
    assert(got("none") == (("none", 3L, 3L, 30L, 0L, 0L, 1.0)))
    // soundness: matches never exceed the scanned row budget
    got.values.foreach(r => assert(r._6 <= r._5, r))
  }
}
