package graft

import org.apache.spark.sql.functions._

/** Smoke: the driver contract — entry() has rows, every registered query
  * runs at sf0.001, oracle keys are a subset of query keys. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys all have matching queries") {
    val qs = SparkEntry.queries.keySet
    val extra = SparkEntry.oracleSql.keySet -- qs
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("every query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf001).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    val rows = SparkEntry.queries("a10_approx_distinct")(spark, sf001)
      .select(col("within_5pct")).collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(0)))
  }

  test("frame-sample stub: stride sampling of byte blocks with fixed block size") {
    val m = graft.operators.Multimodal.asMediaTable(
      Tables.documents(spark, sf001).limit(3), "doc_id", "text", "text/plain")
    val frames = graft.operators.Multimodal.frameSampleStub(m, blockSize = 16, stride = 4)
      .select(col("media_id"), col("frames")).collect()
    frames.foreach { r =>
      val fs = r.getSeq[Array[Byte]](1)
      assert(fs.nonEmpty)
      assert(fs.forall(_.length <= 16))
    }
  }

  test("patchGrid: full grid with clipped edge patches, degenerate dims dropped") {
    import spark.implicits._
    // 20x17 @ patch 16 -> 2x2 grid; right/bottom patches clip to 4/1 px
    val m = Seq((1L, 20, 17), (2L, 16, 16), (3L, 0, 5)).toDF("mid", "w", "h")
    val got = graft.operators.Multimodal.patchGrid(m, col("mid"), col("w"), col("h"), 16)
      .as[(Long, Int, Int, Int, Int, Int, Int, Int)].collect()
    val m1 = got.filter(_._1 == 1L).map(r => (r._2, r._3, r._6, r._7, r._8)).toSet
    assert(m1 == Set(
      (0, 0, 16, 16, 256), (1, 0, 20, 16, 64), (0, 1, 16, 17, 16), (1, 1, 20, 17, 4)))
    assert(got.count(_._1 == 2L) == 1)          // exact single patch
    assert(!got.exists(_._1 == 3L))             // zero-width image dropped
  }

  test("resize stub keeps every factor-th payload byte") {
    import spark.implicits._
    val m = graft.operators.Multimodal.asMediaTable(
      Seq((1L, "abcdefgh"), (2L, "ab"), (3L, "")).toDF("doc_id", "text"),
      "doc_id", "text", "text/plain")
    val got = graft.operators.Multimodal.resizeStub(m, 3)
      .select(col("media_id"), col("resized").cast("string"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "adg", 2L -> "a", 3L -> ""))
  }

  test("multimodal decode stub emits deterministic 8-dim features") {
    val m = graft.operators.Multimodal.asMediaTable(
      Tables.documents(spark, sf001).limit(5), "doc_id", "text", "text/plain")
    val f1 = graft.operators.Multimodal.decodeStub(m)
      .select(col("media_id"), col("features")).collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(f1.forall(_._2.length == 8))
    val f2 = graft.operators.Multimodal.decodeStub(m)
      .select(col("media_id"), col("features")).collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(f1.toMap == f2.toMap) // deterministic across runs
  }
}
