package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("mergeIntervals merges overlapping and touching ranges per key") {
    val df = Seq(
      (1L, "2020-01-01", "2020-01-10"),
      (1L, "2020-01-05", "2020-01-20"), // overlaps
      (1L, "2020-01-20", "2020-01-25"), // touches
      (1L, "2020-02-01", "2020-02-05"), // gap -> new island
      (2L, "2020-01-01", "2020-01-02"),
    ).toDF("k", "f", "t")
      .select(col("k"), to_timestamp(col("f")).as("f"), to_timestamp(col("t")).as("t"))
    val got = Intervals.mergeIntervals(df, col("k"), col("f"), col("t"))
      .select(col("key"), col("range_from").cast("string"), col("range_to").cast("string"),
        col("n_merged"))
      .as[(Long, String, String, Int)].collect().toSet
    assert(got == Set(
      (1L, "2020-01-01 00:00:00", "2020-01-25 00:00:00", 3),
      (1L, "2020-02-01 00:00:00", "2020-02-05 00:00:00", 1),
      (2L, "2020-01-01 00:00:00", "2020-01-02 00:00:00", 1)))
  }

  test("sessionize splits on gap > threshold") {
    val df = Seq(
      (1L, "2020-01-01 00:00:00"), (1L, "2020-01-01 00:10:00"),
      (1L, "2020-01-01 01:00:00"), // 50 min gap -> new session
      (2L, "2020-01-01 00:00:00"),
    ).toDF("user_id", "ts_s").select(col("user_id"), to_timestamp(col("ts_s")).as("ts"))
    val got = Intervals.sessionize(df, col("user_id"), col("ts"), 1800)
      .groupBy(col("user_id"), col("session_seq")).count()
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }
  test("overlapJoin: equi-bucketed plan equals the naive range join") {
    def dt(s: String) = java.sql.Date.valueOf(s)
    val a = Seq((1L, dt("2024-01-01"), dt("2024-01-10")),
      (2L, dt("2024-02-25"), dt("2024-03-05")),  // spans a 32-day bucket edge
      (3L, dt("2024-06-01"), dt("2024-06-02")))
      .toDF("id", "f", "t")
    val b = Seq(("x", dt("2024-01-08"), dt("2024-01-20")),  // overlaps 1
      ("y", dt("2024-03-01"), dt("2024-03-02")),            // overlaps 2 cross-bucket
      ("z", dt("2024-01-25"), dt("2024-01-30")))            // same bucket as 1, NO overlap
      .toDF("id", "f", "t")
    val got = Intervals.overlapJoin(a, b,
        col("id"), col("f"), col("t"), col("id"), col("f"), col("t"))
      .select(col("a_id"), col("b_id"), col("ov_days"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "x", 3L), (2L, "y", 2L)))
    // naive range-join twin over the same frames
    val naive = a.as("a").join(b.as("b"),
        col("a.f") <= col("b.t") && col("b.f") <= col("a.t"))
      .select(col("a.id"), col("b.id"),
        (datediff(least(col("a.t"), col("b.t")),
          greatest(col("a.f"), col("b.f"))) + 1).cast("long"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == naive)
  }

  test("coverageGaps emits only true holes with day widths") {
    def t(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")
    val df = Seq(
      (1L, t("2024-01-01"), t("2024-01-10")),
      (1L, t("2024-01-05"), t("2024-01-12")), // overlaps -> merges
      (1L, t("2024-02-01"), t("2024-02-05")), // 20-day hole before this
      (2L, t("2024-01-01"), t("2024-01-02"))  // single interval: no gap
    ).toDF("k", "f", "t")
    val got = Intervals.coverageGaps(df, col("k"), col("f"), col("t"))
      .select(col("key"), col("gap_days")).as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 20L)))
  }

  test("snapshotAt returns exactly the versions straddling the as-of date") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val versions = Seq(
      (1L, 1, d("2024-01-01"), d("2024-03-31")),
      (1L, 2, d("2024-04-01"), d("2099-01-01")), // open end
      (2L, 1, d("2024-05-01"), d("2024-06-01"))  // not yet effective at as-of
    ).toDF("key", "ver", "f", "t")
    val got = Intervals.snapshotAt(versions, col("f"), col("t"),
        lit("2024-04-15").cast("date"))
      .select(col("key"), col("ver")).as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 2)))
    // boundary days are inclusive on both ends
    val edge = Intervals.snapshotAt(versions, col("f"), col("t"),
        lit("2024-03-31").cast("date"))
      .select(col("key"), col("ver")).as[(Long, Int)].collect().toSet
    assert(edge == Set((1L, 1)))
  }

  test("allenJoin labels every co-occurrence relation exactly once") {
    // one a-interval [2024-01-10, 2024-01-20] against b-intervals that
    // realize each of the 11 co-occurring Allen relations
    val a = Seq(("A", "2024-01-10", "2024-01-20")).toDF("id", "f", "t")
      .select(col("id"), col("f").cast("date"), col("t").cast("date"))
    val b = Seq(
      ("equals", "2024-01-10", "2024-01-20"),
      ("started_by", "2024-01-10", "2024-01-15"), // b starts a => a started_by b
      ("starts", "2024-01-10", "2024-01-25"),     // a starts b
      ("finished_by", "2024-01-15", "2024-01-20"),
      ("finishes", "2024-01-05", "2024-01-20"),
      ("contains", "2024-01-12", "2024-01-18"),
      ("during", "2024-01-05", "2024-01-25"),
      ("meets", "2024-01-20", "2024-01-30"),      // a_to = b_from
      ("met_by", "2024-01-01", "2024-01-10"),     // b_to = a_from
      ("overlaps", "2024-01-15", "2024-01-30"),
      ("overlapped_by", "2024-01-05", "2024-01-15")
    ).toDF("id", "f", "t")
      .select(col("id"), col("f").cast("date"), col("t").cast("date"))
    val got = Intervals.allenJoin(a, b,
        col("id"), col("f"), col("t"), col("id"), col("f"), col("t"),
        bucketDays = 7) // small buckets: pairs must still dedupe to one row
      .as[(String, String, String)].collect()
    assert(got.length == 11)
    got.foreach { case (_, bId, rel) => assert(bId == rel, s"$bId classified $rel") }
  }

  test("allenJoin excludes disjoint pairs") {
    val a = Seq(("A", "2024-01-10", "2024-01-12")).toDF("id", "f", "t")
      .select(col("id"), col("f").cast("date"), col("t").cast("date"))
    val b = Seq(("B", "2024-03-01", "2024-03-05")).toDF("id", "f", "t")
      .select(col("id"), col("f").cast("date"), col("t").cast("date"))
    assert(Intervals.allenJoin(a, b, col("id"), col("f"), col("t"),
      col("id"), col("f"), col("t")).count() == 0)
  }
}
