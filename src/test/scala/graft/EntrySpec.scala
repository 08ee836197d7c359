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
