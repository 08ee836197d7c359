package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // one corpus exercising every funnel stage exactly once:
  //  d1 survives everything; d2 = exact dup of d1 (dropped stage 3);
  //  d3 declared en but French text (dropped at the lang gate);
  //  d4/d5 share an identical shingle set (guaranteed LSH candidates) —
  //  d5 has more tokens -> higher quality -> kept, d4 dropped (stage 4);
  //  d6 shares the 5-gram "p q r s t" with the probe (dropped stage 5).
  private val corpus = Seq(
    (1L, "the cat and the dog is that with the fish", "en", "s1"),
    (2L, "the cat and the dog is that with the fish", "en", "s1"),
    (3L, "le chat est avec le chien pour dans la maison", "en", "s1"),
    (4L, "a b a b a b", "und", "s1"),
    (5L, "a b a b a b a b", "und", "s1"),
    (6L, "z z1 p q r s t z2", "und", "s1")
  ).toDF("doc_id", "text", "lang", "source")
  private val probes = Seq((99L, "p q r s t u")).toDF("doc_id", "text")

  test("curationFunnel applies the five stages sequentially") {
    val got = Curation.curationFunnel(corpus, probes,
        col("doc_id"), col("text"), col("source"), col("lang"),
        minQuality = 0.1)
      .select(col("lang"), col("n_docs"), col("n_quality"), col("n_lang"),
        col("n_exact"), col("n_near"), col("n_kept"), col("tokens_kept"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("en") == (("en", 3L, 3L, 2L, 1L, 1L, 1L, 10L)))
    assert(got("und") == (("und", 3L, 3L, 3L, 3L, 2L, 1L, 8L)))
  }

  test("curationFunnel near-dedup keeps the best-quality cluster member") {
    // raise the bar so only d4/d5/d6 enter (no en stopwords -> quality
    // ~0.22-0.24 for all six; en docs fail the lang gate at und): instead
    // drop the quality gate entirely and check who survives by id
    val kept = Curation.curationFunnel(corpus, probes,
        col("doc_id"), col("text"), col("source"), col("lang"),
        minQuality = 0.0)
      .agg(sum(col("n_kept")), sum(col("tokens_kept")))
      .as[(Long, Long)].head()
    // d1 (10 toks) + d5 (8 toks): d2 exact-dup, d3 lang, d4 lower
    // quality than d5 in the same LSH cluster, d6 contaminated
    assert(kept == ((2L, 18L)))
  }

  test("curationDropLog reports the FIRST stage that dropped each doc") {
    val got = Curation.curationDropLog(corpus, probes,
        col("doc_id"), col("text"), col("source"), col("lang"),
        minQuality = 0.1)
      .select(col("doc_id"), col("verdict")).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "kept", 2L -> "exact_dup", 3L -> "lang",
      4L -> "near_dup", 5L -> "kept", 6L -> "contaminated"))
  }

  test("curationDropLog and curationFunnel agree on survivor counts") {
    val log = Curation.curationDropLog(corpus, probes,
        col("doc_id"), col("text"), col("source"), col("lang"), minQuality = 0.1)
      .filter(col("verdict") === "kept").count()
    val rep = Curation.curationFunnel(corpus, probes,
        col("doc_id"), col("text"), col("source"), col("lang"), minQuality = 0.1)
      .agg(sum(col("n_kept"))).as[Long].head()
    assert(log == rep)
  }

  test("curationFunnel retention is kept/docs per (source, lang)") {
    val r = Curation.curationFunnel(corpus, probes,
        col("doc_id"), col("text"), col("source"), col("lang"),
        minQuality = 0.1)
      .select(col("lang"), col("retention")).as[(String, Double)].collect().toMap
    assert(r("en") == 0.333333 && r("und") == 0.333333)
  }
}
