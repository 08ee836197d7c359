package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("trailingRangeSum: event-time frame excludes same-day peers, honors gaps") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val df = Seq(
      (1L, d("2024-01-01"), 10.0),
      (1L, d("2024-01-01"), 20.0),  // same-day peer: must NOT see the 10
      (1L, d("2024-01-15"), 5.0),   // sees both Jan-1 rows
      (1L, d("2024-06-01"), 7.0),   // > 90 days later: sees nothing
      (2L, d("2024-01-10"), 99.0))  // other key isolated
      .toDF("k", "dt", "v")
    val got = Windows.trailingRangeSum(df, Seq(col("k")), col("dt"), col("v"),
        days = 90, outName = "t")
      .select(col("k"), col("dt"), col("v"), col("t"))
      .as[(Long, java.sql.Date, Double, Option[Double])].collect()
      .map(r => (r._1, r._2.toString, r._3) -> r._4).toMap
    assert(got((1L, "2024-01-01", 10.0)).isEmpty)
    assert(got((1L, "2024-01-01", 20.0)).isEmpty)
    assert(got((1L, "2024-01-15", 5.0)).contains(30.0))
    assert(got((1L, "2024-06-01", 7.0)).isEmpty)
    assert(got((2L, "2024-01-10", 99.0)).isEmpty)
  }

  test("trailingRangeSum: frame is bounded by days, not rows") {
    def d(s: String) = java.sql.Date.valueOf(s)
    // 5 rows inside one 90-day span: each sees ALL prior rows, however many
    val df = (1 to 5).map(i => (1L, d(f"2024-01-$i%02d"), 1.0)).toDF("k", "dt", "v")
    val got = Windows.trailingRangeSum(df, Seq(col("k")), col("dt"), col("v"),
        days = 90, outName = "t")
      .orderBy(col("dt"))
      .select(col("t")).as[Option[Double]].collect().toSeq
    assert(got == Seq(None, Some(1.0), Some(2.0), Some(3.0), Some(4.0)))
  }
}
