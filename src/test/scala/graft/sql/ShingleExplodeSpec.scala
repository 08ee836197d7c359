package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShingleExplodeSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    (1L, "a b c d e"),
    (2L, "a b a b a b"),             // duplicate shingles collapse
    (3L, "  leading and   trailing  "), // 0x20 trim + multi-space split
    (4L, "short"),                   // fewer tokens than n -> no rows
    (5L, ""),                        // empty -> no rows for n >= 2
    (6L, null.asInstanceOf[String]), // null -> no rows
    (7L, "tab\tseparated words here"))

  private def native(n: Int) =
    texts.toDF("doc_id", "text")
      .select(col("doc_id"), call_function("shingle_explode", col("text"), lit(n)).as("sh"))

  private def fallback(n: Int) =
    texts.toDF("doc_id", "text")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", (0 until n).map(j => get(col("toks"), i + j)): _*)))).as("sh"))

  test("shingle_explode generator is row-equal to the HOF fallback") {
    for (n <- Seq(1, 2, 3)) {
      val a = native(n).as[(Long, String)].collect().toSeq.sorted
      val b = fallback(n).as[(Long, String)].collect().toSeq.sorted
      assert(a == b, s"n=$n")
    }
  }

  test("shingle_explode plans as a Generate node (no array materialization)") {
    val p = native(3).queryExecution.executedPlan.toString
    assert(p.contains("Generate") && p.contains("shingle_explode"), p)
    assert(!p.contains("array_distinct"), p)
  }

  test("Dedup.wordShingles routes through the generator when registered") {
    assert(spark.catalog.functionExists("shingle_explode"))
    val df = texts.toDF("doc_id", "text")
    val p = graft.operators.Dedup.wordShingles(df, col("doc_id"), col("text"), 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("shingle_explode"), p)
  }
}
