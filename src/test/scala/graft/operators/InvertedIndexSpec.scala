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
  test("bm25TopK: matching docs rank above partial matches; scores positive") {
    val docs = Seq(
      (1L, "spark join table spark"),
      (2L, "spark only here"),
      (3L, "nothing relevant at all"),
      (4L, "join table join table join")
    ).toDF("doc_id", "text")
    val got = InvertedIndex.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("spark", "join", "table"), k = 10)
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    // doc 3 matches nothing -> absent; all returned scores positive
    assert(!got.exists(_._1 == 3L))
    assert(got.forall(_._2 > 0))
    // docs hitting all three query terms outrank the single-term doc
    val rankOf = got.map(r => r._1 -> r._3).toMap
    assert(rankOf(1L) < rankOf(2L))
    // rank sequence is 1..n
    assert(got.map(_._3).toSeq == (1 to got.length))
  }

  test("bm25TopK saturates term frequency (k1 bound)") {
    val docs = Seq(
      (1L, "term " * 50),
      (2L, "term filler filler filler filler")
    ).toDF("doc_id", "text")
    val got = InvertedIndex.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("term"), k = 2).as[(Long, Double, Int)].collect()
    val s = got.map(r => r._1 -> r._2).toMap
    // tf=50 must not score 50x the tf=1 doc: BM25 caps near (k1+1)*idf
    assert(s(1L) < s(2L) * 4)
  }
  test("phraseSearch: n-term adjacency, counts occurrences, no false partial matches") {
    val docs = Seq(
      (1L, "fast join table scan join table x"),
      (2L, "table join fast"),         // right words, wrong order
      (3L, "join x table")             // not adjacent
    ).toDF("doc_id", "text")
    val two = InvertedIndex.phraseSearch(docs, col("doc_id"), col("text"),
      Seq("join", "table")).as[(Long, Long)].collect().toMap
    assert(two == Map(1L -> 2L))
    val three = InvertedIndex.phraseSearch(docs, col("doc_id"), col("text"),
      Seq("fast", "join", "table")).as[(Long, Long)].collect().toMap
    assert(three == Map(1L -> 1L))
  }

  test("zipfFit matches a local closed-form OLS replay") {
    // freqs: a=5, b=3, c=1, d=1 -> ranks 1..4 (count desc, term asc)
    val docs = Seq((1L, "a a a a b b c"), (2L, "a b d")).toDF("doc_id", "text")
    val got = InvertedIndex.zipfFit(docs, col("doc_id"), col("text"))
      .select(col("n_terms"), col("alpha"), col("intercept"), col("r2"))
      .as[(Long, Double, Double, Double)].collect().head
    val pts = Seq((1, 5), (2, 3), (3, 1), (4, 1)).map { case (r, c) =>
      (math.log(r.toDouble), math.log(c.toDouble))
    }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(got._1 == 4L)
    assert(math.abs(got._2 - -slope) < 1e-6, got)
    assert(math.abs(got._3 - (sy - slope * sx) / n) < 1e-6, got)
    assert(math.abs(got._4 - r2) < 1e-6, got)
    // a frequency spectrum decaying by rank fits with a POSITIVE alpha
    assert(got._2 > 0 && got._4 >= 0 && got._4 <= 1)
  }

  test("heapsLaw: checkpoints, prefix counts, and the OLS fit replay by hand") {
    import spark.implicits._
    // doc i = "t{i} common": every doc adds 1 novel term + 2 tokens, so
    // N(c) = 2c and V(c) = c + 1; n = 8 -> checkpoints {2, 4, 8}
    val docs = (1 to 8).map(i => (i.toLong, s"t$i common")).toDF("doc_id", "text")
    val got = InvertedIndex.heapsLaw(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((2L, 4L, 3L), (4L, 8L, 5L), (8L, 16L, 9L)))
    // OLS replay with the operator's rounding (ln at 9)
    def q9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    val pts = Seq((4L, 3L), (8L, 5L), (16L, 9L))
      .map { case (nt, v) => (q9(math.log(nt.toDouble)), q9(math.log(v.toDouble))) }
    val k = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(math.abs(got.head._4 - slope) < 1e-6, got.head)
    assert(math.abs(got.head._5 - math.exp((sy - slope * sx) / k)) < 1e-6)
    // beta/k_factor identical across checkpoint rows
    assert(got.map(_._4).distinct.length == 1)
    // near-linear vocabulary growth: beta close to 1, bounded by it
    assert(got.head._4 > 0.7 && got.head._4 <= 1.0)
  }
}
