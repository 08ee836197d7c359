package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark makes joins fast"),
    (2L, "joins and scans and joins"),
    (3L, "  fast   scans  "),
    (4L, "")
  ).toDF("doc_id", "text")

  test("build computes df, cf and ascending capped postings") {
    val idx = InvertedIndex.build(docs, col("doc_id"), col("text"), maxPostings = 10)
      .as[(String, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(idx("joins") == (("joins", 2L, 3L, "1,2")))  // tf 2 in doc 2 counts once for df
    assert(idx("fast") == (("fast", 2L, 2L, "1,3")))
    assert(idx("and") == (("and", 1L, 2L, "2")))
    assert(!idx.contains(""))                           // blanks dropped
  }

  test("postings cap bounds the hot-term row") {
    val big = (1L to 100L).map(i => (i, "the")).toDF("doc_id", "text")
    val row = InvertedIndex.build(big, col("doc_id"), col("text"), maxPostings = 5)
      .as[(String, Long, Long, String)].head()
    assert(row._2 == 100L && row._3 == 100L)
    assert(row._4 == "1,2,3,4,5") // lowest ids, deterministic prefix
  }
}
