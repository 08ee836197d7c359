package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zOrder2: hand-checked bit interleaving") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        Layout.zOrder2(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L)   // bit 0 of a -> position 0
    assert(got((0L, 1L)) == 2L)   // bit 0 of b -> position 1
    assert(got((1L, 1L)) == 3L)
    // a=3 (11), b=5 (101): positions a->{0,2}, b->{1,5} = 1+4+2+32 = 39
    assert(got((3L, 5L)) == 39L)
    assert(got((65535L, 65535L)) == 4294967295L) // all 32 low bits set
  }

  test("z-bucket stats keep BOTH dimensions' ranges tight (vs lexicographic)") {
    // 64x64 grid of (a, b) points; z-buckets of 256 cells are 16x16 tiles
    val pts = for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong)
    val df = pts.toDF("a", "b")
    val stats = Layout.zBucketStats(df, col("a"), col("b"),
        bits = 6, bucketShift = 8)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.length == 16) // 4096 points / 256 per bucket
    stats.foreach { case (_, n, minA, maxA, minB, maxB) =>
      assert(n == 256)
      assert(maxA - minA == 15 && maxB - minB == 15) // square tiles
    }
    // lexicographic "files" of the same size: second column spans FULL width
    val lex = df.withColumn("bucket", floor((col("a") * 64 + col("b")) / 256))
      .groupBy("bucket").agg(min(col("b")).as("minB"), max(col("b")).as("maxB"))
      .as[(Long, Long, Long)].collect()
    assert(lex.forall { case (_, minB, maxB) => maxB - minB == 63 })
  }
}
