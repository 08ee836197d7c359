package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d")).toDF("k", "lv")
  private val right = Seq((1, "X"), (2, "Y")).toDF("k", "rv")

  test("saltedJoin matches plain join results") {
    val plain = left.join(right, Seq("k")).select(col("k"), col("lv"), col("rv"))
      .as[(Int, String, String)].collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", salt = 4, leftSaltSource = col("lv"))
      .select(col("k"), col("lv"), col("rv")).as[(Int, String, String)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin left join preserves unmatched rows exactly once") {
    val out = Skew.saltedJoin(left, right, "k", salt = 3,
      leftSaltSource = col("lv"), joinType = "left")
      .select(col("k"), col("lv"), col("rv")).as[(Int, String, Option[String])].collect()
    assert(out.count(_._1 == 3) == 1)
    assert(out.find(_._1 == 3).get._3.isEmpty)
    assert(out.length == 4)
  }

  test("hotKeySplitJoin equals plain join") {
    val plain = left.join(right, Seq("k")).select(col("k"), col("lv"), col("rv"))
      .as[(Int, String, String)].collect().toSet
    val split = Skew.hotKeySplitJoin(left, right, "k", hotKeys = Seq(1))
      .select(col("k"), col("lv"), col("rv")).as[(Int, String, String)].collect().toSet
    assert(split == plain)
  }
}
