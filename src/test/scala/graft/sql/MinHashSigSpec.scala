package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("native signature is bit-equal to the composable explode+agg build") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words in this one here now"),
      (4L, "a b"),              // fewer than 3 tokens -> no signature
      (5L, "  padded   whitespace   tokens   here   everywhere  "),
      (6L, "dup dup dup dup dup dup"))
    val df = docs.toDF("doc_id", "text")
    val native = df.select(col("doc_id"),
        call_function("minhash_sig", col("text"), lit(3), lit(16)).as("sig"))
      .filter(size(col("sig")) > 0)
      .as[(Long, Seq[Long])].collect().toMap
    val p = 4294967311L
    val composed = df
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("toks")) - 3),
          i => concat_ws(" ", get(col("toks"), i), get(col("toks"), i + 1),
            get(col("toks"), i + 2))))).as("sh"))
      .withColumn("h", Dedup2.md5Int(col("sh")))
      .groupBy(col("doc_id"))
      .agg(array((0 until 16).map { i =>
        min((col("h") * (1L + 2L * i) + (11L * i + 7L)) % p)
      }: _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == composed)
    assert(!native.contains(4L))
  }

  test("minHashLshPairs via the kernel: signature build is shuffle-free") {
    val df = (1L to 50L).map(i =>
      (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11} w${i % 13} tail$i"))
      .toDF("doc_id", "text")
    assert(spark.catalog.functionExists("minhash_sig"))
    val sigs = df.select(col("doc_id"),
      call_function("minhash_sig", col("text"), lit(3), lit(16)).as("sig"))
    val plan = sigs.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signature build must not shuffle:\n$plan")
  }
}

/** Local alias so the composable twin uses the exact production hash. */
private object Dedup2 {
  def md5Int(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.operators.Dedup.md5Int(c)
}
