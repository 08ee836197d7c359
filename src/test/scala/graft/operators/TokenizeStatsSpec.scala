package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenizeStatsSpec extends SparkSpec {
  import spark.implicits._

  test("vocabTopN ids follow (cf desc, term) order; encode maps OOV to -1") {
    val docs = Seq(
      (1L, "b a a c"),
      (2L, "a b zz")
    ).toDF("doc_id", "text")
    // cf: a=3, b=2, c=1, zz=1 -> vocab(3): a=0, b=1, c=2; zz OOV
    val vocab = Tokenize.vocabTopN(docs, col("doc_id"), col("text"), v = 3)
      .select(col("term"), col("tok_id")).as[(String, Long)].collect().toMap
    assert(vocab == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    val enc = Tokenize.encodeWithVocab(docs, col("doc_id"), col("text"),
      Tokenize.vocabTopN(docs, col("doc_id"), col("text"), v = 3))
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(enc(1L) == ((4L, "1,0,0,2")))
    assert(enc(2L) == ((3L, "0,1,-1")))
  }

  test("seqPack: running total within group assigns sequence bins") {
    val df = Seq(
      (1L, "s1", 1000L), (2L, "s1", 1000L), (3L, "s1", 100L), (4L, "s1", 3000L),
      (5L, "s2", 10L)
    ).toDF("doc_id", "src", "n_tok")
    val got = Tokenize.seqPack(df, col("src"), col("doc_id"), col("n_tok"), seqLen = 2048)
      .select(col("doc_id"), col("seq_id")).as[(Long, Long)].collect().toMap
    // cum-exclusive: 0, 1000, 2000, 2100 -> bins 0, 0, 0, 1; s2 starts at 0
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
  }

  test("histogram clamps outliers into edge buckets and counts exactly") {
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 55.0, 99.9, 150.0).toDF("v")
    val got = Stats.histogram(df, col("v"), lo = 0.0, hi = 100.0, bins = 10)
      .select(col("bin"), col("n")).as[(Long, Long)].collect().toMap
    assert(got(0L) == 3L) // -5 clamped, 0.0, 9.9
    assert(got(1L) == 1L) // 10.0
    assert(got(5L) == 1L) // 55
    assert(got(9L) == 2L) // 99.9 and clamped 150
    assert(got.values.sum == 7L)
  }

  test("zScoreOutliers flags the planted outlier and zeroes degenerate groups") {
    val base = (1L to 100L).map(i => (i, "g", 10.0 + (i % 7) * 0.1))
    val df = (base :+ ((101L, "g", 500.0)) :+ ((102L, "solo", 4.2)))
      .toDF("id", "grp", "v")
    val got = Stats.zScoreOutliers(df, col("grp"), col("id"), col("v"))
      .select(col("id"), col("z"), col("is_outlier"))
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(101L)._3) // the planted 500.0
    assert(base.forall(b => !got(b._1)._3))
    assert(got(102L)._2 == 0.0 && !got(102L)._3) // single-row group: sd null -> z 0
  }
  test("wordPieceSegment: greedy longest-match with ##-marked continuations") {
    // corpus: abcd x2, ab x1. Multi-char pieces by weight: ab=3, abc=2,
    // ##bc=2, ##bcd=2, ##cd=2 -> top-1 = "ab". Singles: initial {a},
    // continuation {##b,##c,##d} (always in the vocab).
    // greedy "abcd": abc miss, ab HIT -> then ##cd miss, ##c hit, ##d hit.
    val docs = Seq((1L, "abcd ab"), (2L, "abcd")).toDF("doc_id", "text")
    val got = Tokenize.wordPieceSegment(docs, col("doc_id"), col("text"),
        maxPieceLen = 3, vocabSize = 1)
      .select(col("word"), col("freq"), col("n_pieces"), col("wp_seg"))
      .as[(String, Long, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("abcd") == ((2L, 3, "ab ##c ##d")))
    assert(got("ab") == ((1L, 1, "ab")))
  }

  test("bpeMerges: hand-traced two-step merge incl. greedy overlap") {
    // corpus: "aaab aaab ab" -> freq(aaab)=2, freq(ab)=1
    // step 1 pairs: (a,a) weight 4 (two per aaab), (a,b) weight 3 -> merge (a,a)
    //   aaab -> [aa, a, b] (greedy left-to-right: the 2nd/3rd a pair once)
    // step 2 pairs: (aa,a)=2, (a,b)=3 -> merge (a,b): aaab -> [aa, ab]; ab -> [ab]
    val df = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val got = Tokenize.bpeMerges(df, col("doc_id"), col("text"), nMerges = 2)
      .as[(String, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("aaab") == ((2L, "aa ab")))
    assert(got("ab") == ((1L, "ab")))
  }

  test("bpeMerges handles consecutive pair occurrences (boundary sharing)") {
    // "abab": with single-space separators the second (a,b) would escape
    // the replace; the double-separator representation must merge both
    val df = Seq((1L, "abab abab q")).toDF("doc_id", "text")
    val got = Tokenize.bpeMerges(df, col("doc_id"), col("text"), nMerges = 1)
      .as[(String, Long, String)].collect().map(r => r._1 -> r._3).toMap
    assert(got("abab") == "ab ab")
  }
  test("bpeMerges: per-step materialization changes nothing but the lineage") {
    val df = Seq((1L, "banana bandana ban nab"), (2L, "banana ban ban")).toDF("doc_id", "text")
    val lazyRun = Tokenize.bpeMerges(df, col("doc_id"), col("text"), nMerges = 4)
      .as[(String, Long, String)].collect().toSet
    val matRun = Tokenize.bpeMerges(df, col("doc_id"), col("text"), nMerges = 4,
      matEvery = 1).as[(String, Long, String)].collect().toSet
    assert(lazyRun == matRun)
  }

  test("decayedSum halves weights per half-life bucket, exactly") {
    def t(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")
    val df = Seq(
      (1L, 8.0, t("2024-01-29")),  // age 0 days  -> w=1
      (1L, 8.0, t("2024-01-22")),  // age 7 days  -> w=1/2
      (1L, 8.0, t("2024-01-08")),  // age 21 days -> w=1/8
      (2L, 4.0, t("2024-01-29")))  // newest row defines the reference
      .toDF("user_id", "value", "ts")
    val got = Stats.decayedSum(df, col("user_id"), col("value"), col("ts"), 7)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((8.0 + 4.0 + 1.0, 3L)))
    assert(got(2L) == ((4.0, 1L)))
  }

  test("mergeAggState folds partial states into the full recompute") {
    val rows = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0), ("a", 4.0), ("c", 7.0))
    def agg(xs: Seq[(String, Double)]) = xs.toDF("k", "v")
      .groupBy(col("k"))
      .agg(sum(col("v").cast("decimal(10,2)")).as("total"), count(lit(1)).as("n"))
    // three deltas, one of them empty-overlap with the others
    val merged = Stats.mergeAggState(
      Seq(agg(rows.take(2)), agg(rows.slice(2, 4)), agg(rows.drop(4))),
      keys = Seq("k"), measures = Seq("total", "n"))
      .select(col("k"), col("total").cast("double"), col("n"))
      .as[(String, Double, Long)].collect().toSet
    val full = agg(rows)
      .select(col("k"), col("total").cast("double"), col("n"))
      .as[(String, Double, Long)].collect().toSet
    assert(merged == full)
    assert(merged == Set(("a", 7.0, 3L), ("b", 10.0, 1L), ("c", 7.0, 1L)))
  }

  test("funnel: ordering constraint gates later stages") {
    def t(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d")
    val ev = Seq(
      (1L, t(1), "view"), (1L, t(2), "click"), (1L, t(3), "purchase"), // full funnel
      (2L, t(5), "click"), (2L, t(6), "view"),                         // click BEFORE view
      (3L, t(1), "view"),                                              // stops at view
      (4L, t(9), "error")                                              // never enters
    ).toDF("user_id", "ts", "event_type")
    val got = Stats.funnel(ev, col("user_id"), col("ts"), col("event_type"),
      Seq("view", "click", "purchase"))
      .select(col("user_id"), col("stage")).as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 0))
  }

  test("seasonalIndex: exact long cross-product index per ISO weekday") {
    // 2024-01-01 is a Monday. Mon has 2 days x 3 events avg; Tue 1 day x 2
    val ts = Seq(
      "2024-01-01 01:00:00", "2024-01-01 02:00:00", // Mon wk1: 2
      "2024-01-08 01:00:00", "2024-01-08 02:00:00",
      "2024-01-08 03:00:00", "2024-01-08 04:00:00", // Mon wk2: 4
      "2024-01-02 01:00:00", "2024-01-02 02:00:00"  // Tue: 2
    ).map(java.sql.Timestamp.valueOf)
    val got = Stats.seasonalIndex(ts.toDF("ts"), col("ts"))
      .select(col("dow"), col("n_days"), col("n_events"),
        col("events_per_day"), col("seasonal_idx"))
      .as[(Int, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // overall: 8 events / 3 days; Mon rate 3 -> idx 3/(8/3) = 9/8
    assert(got(1) == ((2L, 6L, 3.0, 1.125)))
    assert(got(2) == ((1L, 2L, 2.0, 0.75)))
    assert(got.keySet == Set(1, 2))
  }

  test("madOutliers: exact lower median, MAD, and 3-MAD band") {
    // values: 1,2,3,4,100 -> median 3 (odd n), |x-3| = 2,1,0,1,97 ->
    // MAD 1; 3-MAD band (3-3, 3+3): only 100 is outside, on the high side
    val got = Stats.madOutliers(
        Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("v"), col("v"), k = 3.0)
      .select(col("n"), col("median"), col("mad"), col("n_outliers"),
        col("n_high"), col("n_low"), col("outlier_pct"))
      .as[(Long, Double, Double, Long, Long, Long, Double)].collect().head
    assert(got == ((5L, 3.0, 1.0, 1L, 1L, 0L, 0.2)))
  }

  test("madOutliers: even count takes the LOWER median") {
    // values: 1,2,3,10 -> lower median 2; |x-2| = 1,0,1,8 -> lower MAD 1
    val got = Stats.madOutliers(
        Seq(1.0, 2.0, 3.0, 10.0).toDF("v"), col("v"), k = 3.0)
      .select(col("median"), col("mad"), col("n_outliers"), col("n_high"))
      .as[(Double, Double, Long, Long)].collect().head
    assert(got == ((2.0, 1.0, 1L, 1L)))
  }

  test("transitionMatrix: pair counts and row-normalized probabilities") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:01:00"), "click"),
      (1L, t("2024-01-01 10:02:00"), "view"),
      (1L, t("2024-01-01 10:03:00"), "purchase"),
      (2L, t("2024-01-01 10:00:00"), "view"),
      (2L, t("2024-01-01 10:01:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Stats.transitionMatrix(ev, col("user_id"), col("ts"), col("event_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("p"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // from view: ->click x2, ->purchase x1; from click: ->view x1
    assert(got(("view", "click")) == ((2L, 0.666667)))
    assert(got(("view", "purchase")) == ((1L, 0.333333)))
    assert(got(("click", "view")) == ((1L, 1.0)))
    assert(got.size == 3) // user 2's last event emits no pair
  }

  test("cumulativeReach: cum distinct = running sum of first-seen counts") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 11:00:00")),
      (1L, t("2024-01-02 10:00:00")),                      // day2: only returners
      (3L, t("2024-01-03 10:00:00")), (1L, t("2024-01-03 11:00:00")),
      (1L, t("2024-01-03 12:00:00"))                       // same user twice a day
    ).toDF("user_id", "ts")
    val got = Stats.cumulativeReach(ev, col("user_id"), col("ts"))
      .select(col("day").cast("string"), col("dau"), col("n_new"),
        col("cum_users"), col("pct_new"))
      .as[(String, Long, Long, Long, Double)].collect().sortBy(_._1).toList
    assert(got == List(
      ("2024-01-01", 2L, 2L, 2L, 1.0),
      ("2024-01-02", 1L, 0L, 2L, 0.0),
      ("2024-01-03", 2L, 1L, 3L, 0.5)))
  }

  test("attribution: last-touch picks latest in-window; linear splits pro-rata") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: view then click then purchase -> last = click; linear 50/50
      (1L, t("2024-01-10 10:00:00"), "view", 0.0),
      (1L, t("2024-01-10 11:00:00"), "click", 0.0),
      (1L, t("2024-01-10 12:00:00"), "purchase", 10.0),
      // user 2: purchase with no touches at all -> none
      (2L, t("2024-01-10 12:00:00"), "purchase", 5.0),
      // user 3: view 8 days before purchase -> outside 7d lookback -> none
      (3L, t("2024-01-02 12:00:00"), "view", 0.0),
      (3L, t("2024-01-10 13:00:00"), "purchase", 7.0),
      // user 4: two views, one click in window -> last = click;
      // linear: view 2/3, click 1/3
      (4L, t("2024-01-10 09:00:00"), "view", 0.0),
      (4L, t("2024-01-10 09:30:00"), "click", 0.0),
      (4L, t("2024-01-10 09:45:00"), "view", 0.0),
      (4L, t("2024-01-10 10:00:00"), "purchase", 9.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = Stats.attribution(ev, col("user_id"), col("ts"),
        col("event_type"), col("value"), Seq("view", "click"), "purchase", 604800L)
      .select(col("channel"), col("n_last_touch"),
        col("last_touch_rev"), col("linear_rev"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // user 4's LAST touch is the 09:45 view (later than the click)
    assert(got("view") == ((1L, 9.0, 5.0 + 6.0)))   // u4 last; linear u1 5 + u4 6
    assert(got("click") == ((1L, 10.0, 5.0 + 3.0))) // u1 last; linear u1 5 + u4 3
    assert(got("none") == ((2L, 12.0, 12.0)))       // u2 + u3 both models
  }

  test("bpeEncodeStats at 0 merges: every char a token, chars_per_token=1") {
    val docs = Seq(
      (1L, "ab cde", "en"),
      (2L, "ab", "fr")
    ).toDF("doc_id", "text", "lang")
    val got = Tokenize.bpeEncodeStats(docs, col("doc_id"), col("text"),
        col("lang"), nMerges = 0, matEvery = 0)
      .select(col("grp"), col("n_words"), col("n_tokens"),
        col("fertility"), col("chars_per_token"))
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // en: 2 word occurrences, 2+3=5 char tokens; fr: 1 occurrence, 2 tokens
    assert(got("en") == ((2L, 5L, 2.5, 1.0)))
    assert(got("fr") == ((1L, 2L, 2.0, 1.0)))
  }

  test("bpeEncodeStats: merges drop fertility, raise chars/token") {
    // one distinct word "abab", freq 3: merge1 joins the heaviest pair
    // ('a','b' weight 6) -> "ab ab", merge2 -> "abab" (one token/word)
    val docs = Seq(
      (1L, "abab abab", "en"),
      (2L, "abab", "en")
    ).toDF("doc_id", "text", "lang")
    def stats(n: Int) = Tokenize.bpeEncodeStats(docs, col("doc_id"),
        col("text"), col("lang"), nMerges = n, matEvery = 1)
      .select(col("n_tokens"), col("fertility"), col("chars_per_token"))
      .as[(Long, Double, Double)].collect().head
    assert(stats(0) == ((12L, 4.0, 1.0)))
    assert(stats(1) == ((6L, 2.0, 2.0)))
    assert(stats(2) == ((3L, 1.0, 4.0)))
  }

  test("unigramSegment: Viterbi picks the highest-probability segmentation") {
    // words: abab (freq 2), cc (1). Piece freqs (weighted): a=4 ab=4
    // aba=2 b=4 ba=2 bab=2 c=2 cc=1, vtot=21. "ab ab" (2 pieces at
    // ln(4/21)) beats "a b a b" (4 pieces) and "aba b"; "cc" beats "c c"
    val docs = Seq((1L, "abab abab cc")).toDF("doc_id", "text")
    val got = Tokenize.unigramSegment(docs, col("doc_id"), col("text"),
        maxPieceLen = 3, vocabSize = 40)
      .select(col("word"), col("freq"), col("n_pieces"), col("seg"), col("score"))
      .as[(String, Long, Int, String, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("abab")._3 == 2 && got("abab")._4 == "ab ab")
    assert(math.abs(got("abab")._5 - 2 * math.log(4.0 / 21)) < 1e-6)
    assert(got("cc")._3 == 1 && got("cc")._4 == "cc")
    assert(got("cc")._2 == 1L)
  }

  test("unigramSegment: segmentation is valid (pieces concatenate back to the word)") {
    val docs = Seq(
      (1L, "spark table query window partition shuffle"),
      (2L, "spark sparkly tables querying windows"),
      (3L, "partition partitions shuffled shuffles table")).toDF("doc_id", "text")
    val bad = Tokenize.unigramSegment(docs, col("doc_id"), col("text"),
        maxPieceLen = 4, vocabSize = 20)
      .filter(regexp_replace(col("seg"), " ", "") =!= col("word"))
      .count()
    assert(bad == 0L)
    // every word segments (all-single-chars vocab floor)
    val n = Tokenize.unigramSegment(docs, col("doc_id"), col("text"),
      maxPieceLen = 4, vocabSize = 20).count()
    val distinctWords = docs.select(explode(split(col("text"), " "))).distinct.count()
    assert(n == distinctWords)
  }

  test("unigramVocab: hard-EM counts and Laplace probabilities on a hand corpus") {
    // after one EM round on "abab abab cc": segs are "ab ab" (freq 2)
    // and "cc" (1) -> uses: ab=4, cc=1, everything else 0; tot=5, V=8
    // p(ab)=(4+.5)/(5+4)=0.5, p(cc)=1.5/9, p(unused)=0.5/9
    val docs = Seq((1L, "abab abab cc")).toDF("doc_id", "text")
    val got = Tokenize.unigramVocab(docs, col("doc_id"), col("text"),
        maxPieceLen = 3, vocabSize = 40, emIters = 1)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 8)
    assert(got("ab") == (("ab", 4L, 0.5)))
    assert(got("cc")._2 == 1L && math.abs(got("cc")._3 - 1.5 / 9) < 1e-6)
    assert(got("ba")._2 == 0L && math.abs(got("ba")._3 - 0.5 / 9) < 1e-6)
    // Laplace normalizes exactly: probabilities sum to 1 (mod rounding)
    val sump = got.values.map(_._3).sum
    assert(math.abs(sump - 1.0) < 1e-4)
  }

  test("unigramEncodeStats: fertility and chars/token from the Viterbi segmentation") {
    // initial (freq-seeded) vocab segments abab -> "ab ab", cc -> "cc"
    // (same corpus as the unigramSegment test). en: abab x2 -> 2 words,
    // 4 tokens, 8 chars; fr: cc x1 -> 1 word, 1 token, 2 chars
    val docs = Seq(
      (1L, "abab abab", "en"),
      (2L, "cc", "fr")
    ).toDF("doc_id", "text", "lang")
    val got = Tokenize.unigramEncodeStats(docs, col("doc_id"), col("text"),
        col("lang"), maxPieceLen = 3, vocabSize = 40, emIters = 0)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("en") == (("en", 2L, 4L, 2.0, 2.0)))
    assert(got("fr") == (("fr", 1L, 1L, 1.0, 2.0)))
  }

  test("abTestCuped matches a naive per-user replay (Welch + CUPED formulas)") {
    // pre (x) on Jan 1, post (y) on Jan 9 -> midpoint Jan 5; y ~ 2x with
    // one perturbation so the adjusted variance stays positive; u6 has
    // no metric events (contributes zeros); 'z' events must be ignored
    val xs = Map(0L -> 10.0, 1L -> 20.0, 2L -> 30.0, 3L -> 40.0, 4L -> 50.0, 5L -> 60.0)
    val ys = Map(0L -> 25.0, 1L -> 40.0, 2L -> 60.0, 3L -> 80.0, 4L -> 100.0, 5L -> 120.0)
    val rows =
      xs.toSeq.map { case (u, v) => (u, "2024-01-01 00:00:00", "m", v) } ++
      ys.toSeq.map { case (u, v) => (u, "2024-01-09 00:00:00", "m", v) } ++
      Seq((0L, "2024-01-02 00:00:00", "z", 999.0), (6L, "2024-01-03 00:00:00", "z", 5.0))
    val ev = rows.toDF("u", "ts_s", "et", "v")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Stats.abTestCuped(ev, col("u"), col("ts"), col("et"), col("v"),
        convType = "m", armOf = u => pmod(u, lit(2))).collect().head
    // naive replay over per-user (y, x) incl. the zero user 6 (arm 0)
    val users = (0L to 6L).map(u => (u % 2, ys.getOrElse(u, 0.0), xs.getOrElse(u, 0.0)))
    def stats(a: Long) = {
      val g = users.filter(_._1 == a)
      val n = g.size.toDouble
      val (sy, sx) = (g.map(_._2).sum, g.map(_._3).sum)
      val (syy, sxx, sxy) =
        (g.map(t => t._2 * t._2).sum, g.map(t => t._3 * t._3).sum,
          g.map(t => t._2 * t._3).sum)
      (n, sy, sx, syy, sxx, sxy)
    }
    val (na, sya, sxa, syya, sxxa, sxya) = stats(0)
    val (nb, syb, sxb, syyb, sxxb, sxyb) = stats(1)
    val n = na + nb
    val (mya, myb) = (sya / na, syb / nb)
    val (mxa, mxb, mx) = (sxa / na, sxb / nb, (sxa + sxb) / n)
    def v(s2: Double, s: Double, k: Double) = (s2 - s * s / k) / (k - 1)
    val (vya, vyb) = (v(syya, sya, na), v(syyb, syb, nb))
    val (vxa, vxb) = (v(sxxa, sxa, na), v(sxxb, sxb, nb))
    val cva = (sxya - sxa * sya / na) / (na - 1)
    val cvb = (sxyb - sxb * syb / nb) / (nb - 1)
    val se2 = vya / na + vyb / nb
    val t = (mya - myb) / math.sqrt(se2)
    val theta = (n * (sxya + sxyb) - (sxa + sxb) * (sya + syb)) /
      (n * (sxxa + sxxb) - (sxa + sxb) * (sxa + sxb))
    val (ama, amb) = (mya - theta * (mxa - mx), myb - theta * (mxb - mx))
    val ava = vya - 2 * theta * cva + theta * theta * vxa
    val avb = vyb - 2 * theta * cvb + theta * theta * vxb
    val adjT = (ama - amb) / math.sqrt(ava / na + avb / nb)
    val varRed = 1.0 - (ava + avb) / (vya + vyb)
    assert(got.getAs[Long]("n_a") == 4L && got.getAs[Long]("n_b") == 3L)
    def ck(nm: String, want: Double) =
      assert(math.abs(got.getAs[Double](nm) - want) < 1e-5, s"$nm: $got vs $want")
    ck("mean_a", mya); ck("mean_b", myb); ck("diff", mya - myb)
    ck("t_stat", t); ck("theta", theta); ck("adj_diff", ama - amb)
    ck("adj_t_stat", adjT); ck("var_reduction", varRed)
    // CUPED must help on a strongly-correlated covariate
    assert(got.getAs[Double]("var_reduction") > 0.9)
  }

  test("markovAttribution: hand-replayed removal effects on a 2-channel chain") {
    // u1: a -> buy(10); u2: a -> b -> (null); u3: b -> buy(20)
    // T: START->{a:2/3, b:1/3}, a->{CONV:.5, b:.5}, b->{CONV:.5, NULL:.5}
    // base p(START)=.666667*.75+.333333*.5; remove a -> .333333*.5;
    // remove b -> .666667*.5. RE=(0.75, 0.5); rev=30 split 18/12
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", "a", 0.0), (1L, "2024-01-02 00:00:00", "buy", 10.0),
      (2L, "2024-01-01 00:00:00", "a", 0.0), (2L, "2024-01-02 00:00:00", "b", 0.0),
      (3L, "2024-01-01 00:00:00", "b", 0.0), (3L, "2024-01-02 00:00:00", "buy", 20.0)
    ).toDF("u", "ts_s", "et", "v").withColumn("ts", to_timestamp(col("ts_s")))
    val got = Stats.markovAttribution(ev, col("u"), col("ts"), col("et"),
        col("v"), channels = Seq("a", "b"), convType = "buy")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(math.abs(got("a")._2 - 0.1666665) < 1e-9)
    assert(got("a")._3 == 0.75 && got("a")._4 == 18.0)
    assert(math.abs(got("b")._2 - 0.3333335) < 1e-9)
    assert(got("b")._3 == 0.5 && got("b")._4 == 12.0)
  }

  test("markovAttribution: user whose first event converts feeds START->CONV") {
    // u1's journey is empty but converted; u2 never converts.
    // T: START->{CONV:.5, NULL:.5} only -> base p=0.5, removals change
    // nothing -> all REs 0, no revenue attributed
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", "buy", 5.0),
      (2L, "2024-01-01 00:00:00", "x", 0.0)
    ).toDF("u", "ts_s", "et", "v").withColumn("ts", to_timestamp(col("ts_s")))
    val got = Stats.markovAttribution(ev, col("u"), col("ts"), col("et"),
        col("v"), channels = Seq("a", "b"), convType = "buy")
      .as[(String, Double, Double, Double)].collect()
    assert(got.length == 2)
    assert(got.forall(r => r._2 == 0.5 && r._3 == 0.0 && r._4 == 0.0))
  }

  test("kaplanMeier: hand-replayed product-limit curve with censoring") {
    // u1 buys at dur 2, u3 at dur 2, u4 at dur 0; u2 censored at the
    // corpus max day (dur 4), u5 censored at dur 0.
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", "view"), (1L, "2024-01-03 00:00:00", "buy"),
      (2L, "2024-01-01 00:00:00", "view"), (2L, "2024-01-02 00:00:00", "view"),
      (3L, "2024-01-02 00:00:00", "view"), (3L, "2024-01-04 00:00:00", "buy"),
      (4L, "2024-01-01 00:00:00", "buy"),
      (5L, "2024-01-05 00:00:00", "view")
    ).toDF("u", "ts_s", "et").withColumn("ts", to_timestamp(col("ts_s")))
    val got = Stats.kaplanMeier(ev, col("u"), col("ts"), col("et"), "buy")
      .orderBy("dur_days")
      .as[(Long, Long, Long, Long, Double)].collect()
    // dur0: risk 5, 1 event 1 censored -> S=0.8; dur2: risk 3, 2 events
    // -> S=0.8/3; dur4: censor only, S unchanged
    assert(got sameElements Array(
      (0L, 5L, 1L, 1L, 0.8),
      (2L, 3L, 2L, 0L, 0.266667),
      (4L, 1L, 0L, 1L, 0.266667)))
  }

  test("kaplanMeier: terminal all-events step drives survival to exactly 0") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", "view"), (1L, "2024-01-02 00:00:00", "buy"),
      (2L, "2024-01-01 00:00:00", "view"), (2L, "2024-01-03 00:00:00", "buy")
    ).toDF("u", "ts_s", "et").withColumn("ts", to_timestamp(col("ts_s")))
    val got = Stats.kaplanMeier(ev, col("u"), col("ts"), col("et"), "buy")
      .orderBy("dur_days")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got sameElements Array((1L, 2L, 1L, 0L, 0.5), (2L, 1L, 1L, 0L, 0.0)))
  }

  test("cusumChangepoint: closed form equals the sequential recurrence; alarm fires after the shift") {
    // 4 baseline days at 2/day, then a level shift to 5/day: the CUSUM
    // accumulates (x - mean - slack) = 2/day post-shift and alarms once it
    // exceeds the threshold — never during the baseline.
    val counts = Seq(2, 2, 2, 2, 5, 5, 5, 5, 5)
    val rows = counts.zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i => (d.toLong * 10 + i, f"2024-02-${d + 1}%02d 0$i:00:00", "error"))
    }
    val ev = rows.toDF("event_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Stats.cusumChangepoint(ev, col("ts"),
        col("event_type") === "error",
        baselineDays = 4, slack = 1, threshold = 4)
      .orderBy("day")
      .select(col("x"), col("cusum_scaled"), col("alarm"))
      .as[(Long, Long, Boolean)].collect()
    // sequential replay: mean 2, slack 1 -> y = x - 3 (scaled by bn = 4)
    var s = 0L
    val want = counts.map { x =>
      s = math.max(0L, s + (x * 4L - 8L - 4L)); s
    }
    assert(got.map(_._2).toSeq == want)
    assert(got.map(_._3).toSeq ==
      want.map(_ > 4 * 4L)) // alarm: S > threshold*bn
    assert(!got.take(4).exists(_._3) && got.last._3)
  }

  test("dpNoisyCounts: noise matches an independent JVM replay of the inverse CDF") {
    val docs = Seq.tabulate(10)(i => (i.toLong, s"src${i % 3}")).toDF("id", "source")
    val got = Stats.dpNoisyCounts(docs, col("source"), eps = 1.0, seed = "graft")
      .as[(String, Double)].collect().toMap
    def expected(key: String, n: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(("graft" + key).getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(6)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 16777216.0
      val lnr = BigDecimal(math.log(1.0 - 2.0 * math.abs(u - 0.5)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val sgn = if (u >= 0.5) 1.0 else -1.0
      val noise = BigDecimal(-1.0 * sgn * lnr)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      BigDecimal(n + noise).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got("src0") == expected("src0", 4L))
    assert(got("src1") == expected("src1", 3L))
    assert(got("src2") == expected("src2", 3L))
    assert(got.values.forall(v => v != math.rint(v))) // noise actually applied
  }

  test("skyline2d matches the brute-force frontier, including x-ties and equal-y chains") {
    // per-x maxima: 1->10 2->20 3->20 4->15 5->1. Strict staircase rule
    // (max_y must EXCEED every max at larger x): x=2 falls to x=3's equal
    // 20; x=1 falls to 20; x=4 survives (only 1 above it); x=5 trivially
    val pts = Seq((1.0, 10), (2.0, 20), (2.0, 5), (3.0, 20), (4.0, 15), (5.0, 1))
      .toDF("x", "y")
    val got = Stats.skyline2d(pts, col("x"), col("y"), buckets = 2)
      .as[(Double, Int, Long)].collect().toSet
    assert(got == Set((3.0, 20, 1L), (4.0, 15, 1L), (5.0, 1, 1L)))
  }

  test("skyline2d bucketing is result-invariant (1, 3, 64 buckets agree with brute force)") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(300)((rnd.nextInt(40) / 4.0, rnd.nextInt(50))).toDF("x", "y")
    // brute force: per-x max, keep rows strictly above every larger-x max
    val g = pts.groupBy(col("x")).agg(max(col("y")).as("my"), count(lit(1)).as("n"))
      .as[(Double, Int, Long)].collect()
    val expect = g.filter { case (x, my, _) =>
      !g.exists { case (x2, my2, _) => x2 > x && my2 >= my } }.toSet
    for (b <- Seq(1, 3, 64)) {
      val got = Stats.skyline2d(pts, col("x"), col("y"), buckets = b)
        .as[(Double, Int, Long)].collect().toSet
      assert(got == expect, s"buckets=$b")
    }
  }
}
