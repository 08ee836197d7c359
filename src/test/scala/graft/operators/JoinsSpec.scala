package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin resolves each fact to the covering version") {
    val dim = Seq(
      (1L, "v1", "2020-01-01", Some("2020-06-30")),
      (1L, "v2", "2020-07-01", None),
      (2L, "v1", "2020-01-01", None),
    ).toDF("dk", "ver", "from_s", "to_s")
      .select(col("dk"), col("ver"), to_date(col("from_s")).as("f"), to_date(col("to_s")).as("t"))
    val fact = Seq((1L, "2020-03-15"), (1L, "2020-07-01"), (2L, "2021-01-01"), (3L, "2020-01-01"))
      .toDF("fk", "ts_s").select(col("fk"), to_date(col("ts_s")).as("ts"))
    val got = Joins.asOfJoin(fact, dim, col("fk") === col("dk"), col("ts"), col("f"), col("t"))
      .select(col("fk"), col("ts").cast("string"), col("ver"))
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "2020-03-15", "v1"), (1L, "2020-07-01", "v2"), (2L, "2021-01-01", "v1")))
  }

  test("bandJoin matches inclusive bounds") {
    val bands = Seq((1, 10, "S"), (11, 20, "M")).toDF("lo", "hi", "band")
    val facts = Seq(1, 10, 11, 25).toDF("v")
    val got = Joins.bandJoin(facts, bands, None, col("v"), col("lo"), col("hi"))
      .select(col("v"), col("band")).as[(Int, String)].collect().toSet
    assert(got == Set((1, "S"), (10, "S"), (11, "M")))
  }

  test("wildcardLookup resolves most-specific tier first") {
    val rules = Seq(
      ("B1", "T1", 10, 1), ("B1", "*", 20, 2), ("*", "T2", 30, 3), ("*", "*", 99, 4))
      .toDF("r_b", "r_t", "rate", "rule_id")
    val fact = Seq(("p1", "B1", "T1"), ("p2", "B1", "T9"), ("p3", "B9", "T2"), ("p4", "B9", "T9"))
      .toDF("id", "b", "t")
    val got = Joins.wildcardLookup(fact, rules,
        keyCols = Seq("b" -> "r_b", "t" -> "r_t"),
        priority = Seq(Set("r_b", "r_t"), Set("r_b"), Set("r_t"), Set.empty),
        payload = Seq("rate", "rule_id"))
      .select(col("id"), col("rule_id")).as[(String, Int)].collect().toSet
    assert(got == Set(("p1", 1), ("p2", 2), ("p3", 3), ("p4", 4)))
  }

  test("wildcardLookup keeps duplicate fact rows distinct") {
    val rules = Seq(("B1", "T1", 10, 1), ("*", "*", 99, 4)).toDF("r_b", "r_t", "rate", "rule_id")
    // two IDENTICAL fact rows: each must resolve independently (a window
    // keyed on all fact columns would collapse them to one output row)
    val fact = Seq(("p1", "B1", "T1"), ("p1", "B1", "T1"), ("p2", "B9", "T9"))
      .toDF("id", "b", "t")
    val got = Joins.wildcardLookup(fact, rules,
        keyCols = Seq("b" -> "r_b", "t" -> "r_t"),
        priority = Seq(Set("r_b", "r_t"), Set.empty),
        payload = Seq("rate", "rule_id"))
      .select(col("id"), col("rule_id")).as[(String, Int)].collect().toSeq
    assert(got.sorted == Seq(("p1", 1), ("p1", 1), ("p2", 4)))
  }

  test("top1PerGroup keeps exactly one row per key") {
    val df = Seq((1, "a", 3), (1, "b", 5), (2, "c", 1)).toDF("k", "v", "o")
    val got = Joins.top1PerGroup(df, Seq(col("k")), Seq(col("o").desc))
      .select(col("k"), col("v")).as[(Int, String)].collect().toSet
    assert(got == Set((1, "b"), (2, "c")))
  }

  test("nearestMatchJoin picks minimal distance with tiebreak") {
    val fact = Seq((1, 10), (2, 7)).toDF("fid", "target")
    val dim = Seq((1, 100, 8), (1, 101, 12), (1, 102, 12), (2, 200, 7)).toDF("k", "cand", "v")
    val got = Joins.nearestMatchJoin(fact, dim, col("fid") === col("k"),
        Seq(col("fid")), col("v") - col("target"), Seq(col("cand")))
      .select(col("fid"), col("cand")).as[(Int, Int)].collect().toSet
    // fid=1: |8-10|=2 = |12-10|=2 -> tiebreak lowest cand=100
    assert(got == Set((1, 100), (2, 200)))
  }

  test("bloomSemiJoin is result-identical to the plain semi join") {
    val fact = ((1L to 200L).map(i => (java.lang.Long.valueOf(i), s"f$i")) :+
      ((null: java.lang.Long), "fnull")) // null key must not match (and not NPE)
      .toDF("k", "payload")
    val keys = Seq(3L, 7L, 7L, 150L, 999L).toDF("kk") // dup + non-matching key
    val got = Joins.bloomSemiJoin(fact, keys, "k", "kk", expectedItems = 100L)
      .select(col("k")).as[Long].collect().sorted
    val plain = fact.join(keys.select(col("kk").as("k")), Seq("k"), "left_semi")
      .select(col("k")).as[Long].collect().sorted
    assert(got.toSeq == plain.toSeq && got.toSeq == Seq(3L, 7L, 150L))
  }

  test("bloomSemiJoin default sizes the filter from the key side's count") {
    val fact = (1L to 200L).map(i => (i, s"f$i")).toDF("k", "payload")
    val keys = Seq(3L, 7L, 150L).toDF("kk")
    // auto-sized (expectedItems <= 0) must stay result-identical
    val got = Joins.bloomSemiJoin(fact, keys, "k", "kk")
      .select(col("k")).as[Long].collect().sorted
    assert(got.toSeq == Seq(3L, 7L, 150L))
  }

  test("linkagePairs: agreement weights, null fields score zero, blocking bounds candidates") {
    val a = Seq(
      (1L, "b1", "ann", "x"),
      (2L, "b1", "bob", null.asInstanceOf[String]),
      (3L, "b2", "cat", "z"))
      .toDF("rid", "blk", "name", "tag")
    val b = Seq(
      (10L, "b1", "ann", "x"),   // full agree with 1: 3 + 1 = 4
      (11L, "b1", "ann", "y"),   // name agree, tag disagree with 1: 3 - 1 = 2
      (12L, "b1", "bob", "x"),   // name agree with 2, 2's tag null: 3 + 0 = 3
      (13L, "b3", "cat", "z"))   // right block key unseen on the left
      .toDF("rid", "blk", "name", "tag")
    val got = Joins.linkagePairs(a, b, "blk", "rid",
      Seq(("name", 3.0, -3.0), ("tag", 1.0, -1.0)), threshold = 3.0)
      .as[(Long, Long, Int, Double)].collect().toSet
    // cat/cat would score 4 but lives in different blocks -> never compared
    assert(got == Set((1L, 10L, 2, 4.0), (2L, 12L, 1, 3.0)))
  }

  test("fuzzyLookup resolves dirty values to the nearest vocab entry, folds duplicates, nulls the unmatched") {
    val dirty = Seq("cold plte", "cold plte", "larg ring", "zzzzzzzzz").toDF("n")
    val vocab = Seq("cold plate", "large ring", "old plate").toDF("v")
    val got = Joins.fuzzyLookup(dirty, col("n"), vocab, col("v"), 2)
      .as[(String, Option[String], Option[Int], Long)].collect().toSet
    // "cold plte" -> "cold plate" at dist 1 (beats "old plate" at 2);
    // the duplicate dirty row folds into n_rows, never a second match row
    assert(got == Set(
      ("cold plte", Some("cold plate"), Some(1), 2L),
      ("larg ring", Some("large ring"), Some(1), 1L),
      ("zzzzzzzzz", None, None, 1L)))
  }

  test("fuzzyLookup breaks distance ties on the lexicographically smallest candidate") {
    val dirty = Seq("cat").toDF("n")
    val vocab = Seq("car", "cab", "bat").toDF("v") // all at distance 1
    val got = Joins.fuzzyLookup(dirty, col("n"), vocab, col("v"), 2)
      .as[(String, Option[String], Option[Int], Long)].collect().toSeq
    assert(got == Seq(("cat", Some("bat"), Some(1), 1L)))
  }

  test("fuzzyLookup length-bucket blocking is lossless vs the unblocked cross product") {
    // varied lengths so the band actually prunes; the blocked operator
    // must still return exactly what an exhaustive scan returns
    val dirtyRows = Seq("ab", "abcd", "abcdefg", "abcdefghijk", "qqqq",
      "abce", "bcdefg", "abcdxfghijk", "zz")
    val vocabRows = Seq("abc", "abcdef", "abcdefghij", "mmmmmmmmmmmmmmm")
    val dirty = dirtyRows.toDF("n")
    val vocab = vocabRows.toDF("v")
    val maxDist = 2
    val got = Joins.fuzzyLookup(dirty, col("n"), vocab, col("v"), maxDist)
      .as[(String, Option[String], Option[Int], Long)].collect().toSet
    val full = dirty.groupBy(col("n").as("dirty_name"))
      .agg(count(lit(1)).as("n_rows"))
      .crossJoin(vocab.select(col("v").as("cand")).distinct())
      .withColumn("dist", levenshtein(col("dirty_name"), col("cand")))
      .filter(col("dist") <= maxDist)
    val best = full.groupBy("dirty_name").agg(min("dist").as("bd"))
    val expectMatched = full.join(best, Seq("dirty_name"))
      .filter(col("dist") === col("bd"))
      .groupBy("dirty_name")
      .agg(min("cand").as("m"), min("dist").cast("int").as("bd2"))
    val expect = dirty.groupBy(col("n").as("dirty_name"))
      .agg(count(lit(1)).as("n_rows"))
      .join(expectMatched, Seq("dirty_name"), "left")
      .select(col("dirty_name"), col("m"), col("bd2"), col("n_rows"))
      .as[(String, Option[String], Option[Int], Long)].collect().toSet
    assert(got == expect)
  }
  test("editDistancePairs pigeonhole blocking is lossless vs the unblocked cross product") {
    // adversarial shapes: indels that shift segments, edits clustered in
    // one segment, equal-length substitution pairs, short strings where
    // segments clip, and unrelated noise the blocking must prune
    val nm = Seq("alpha", "alphb", "alphbx", "xalpha", "alpa", "aXpYa",
      "abcdefghij", "abcdefghi", "zabcdefghij", "abcdefgxyj", "qq", "qr",
      "q", "zzzzzz", "mississippi", "misissippi", "mississippiz")
    val names = nm.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("nid", "nm")
    for (maxDist <- Seq(1, 2)) {
      val got = Joins.editDistancePairs(names, maxDist)
        .select("id_a", "id_b", "dist")
        .as[(Long, Long, Int)].collect().toSet
      val a = names.select(col("nid").as("id_a"), col("nm").as("nm_a"))
      val b = names.select(col("nid").as("id_b"), col("nm").as("nm_b"))
      val expect = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("nm_a"), col("nm_b")))
        .filter(col("dist") <= maxDist)
        .select("id_a", "id_b", "dist")
        .as[(Long, Long, Int)].collect().toSet
      assert(got == expect, s"maxDist=$maxDist")
    }
  }

  test("fuzzyEntities: transitive chains merge, fan-back counts records, noise stays singleton") {
    // alpha~alphb (d1), alphb~alphbx (d1) chain transitively even though
    // alpha~alphbx is d2 > maxDist; "alpha" appears in 2 records
    val recs = Seq(
      (10L, "alpha"), (11L, "alpha"), (12L, "alphb"), (13L, "alphbx"),
      (14L, "zzzzzz"), (15L, "qq"), (16L, "qr")
    ).toDF("rid", "nm")
    val got = Joins.fuzzyEntities(recs, col("rid"), col("nm"), maxDist = 1)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (10L, "alpha", 3L, 4L),
      (14L, "zzzzzz", 1L, 1L),
      (15L, "qq", 2L, 2L)))
  }
}
