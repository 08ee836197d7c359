package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** The end-to-end pretraining-corpus curation funnel: the composite
  * pipeline an LLM-data team actually ships, assembled from the
  * first-class operators ([[TextFunctions.qualityScore]],
  * [[TextFunctions.langId]], [[Dedup]], [[Components]], [[Joins]]).
  *
  * Stages are SEQUENTIAL — each one only processes the previous stage's
  * survivors, exactly like a production pipeline (and the cheap row-local
  * filters run first, so the expensive pairwise dedup sees the smallest
  * possible frame):
  *
  *   1. quality gate: composite quality score >= `minQuality`;
  *   2. language gate: n-gram lang-id agrees with the declared language
  *      (drops mislabeled docs and languages the id model doesn't know);
  *   3. exact dedup: keep the min-id owner of each normalized-content
  *      fingerprint (one hash aggregate);
  *   4. near dedup: MinHash-LSH candidate pairs -> connected components
  *      -> keep the best-quality member per cluster (id tiebreak) —
  *      band-blocked, never all-pairs;
  *   5. decontamination: any document sharing at least one distinct word
  *      `contamN`-gram with the `probes` frame (the benchmark/eval set)
  *      is dropped — the strict "any hit kills" policy.
  *
  * Returns ONE row per (source, lang): the doc count entering the funnel
  * and surviving each stage, whitespace tokens kept, and the end-to-end
  * retention ratio. The report is a single hash aggregate over the
  * flagged base frame — stage flags travel as doc-id equi joins, so at
  * 100 TB every join here is a hash shuffle on doc_id (or an AQE
  * broadcast when a stage's survivor/drop set is small), and the
  * per-(source, lang) output is metadata-sized.
  */
object Curation {

  /** Per-doc stage flags — the shared substrate of [[curationFunnel]]
    * (the aggregate report) and [[curationDropLog]] (the per-doc audit).
    * One row per corpus doc with pass_q/pass_l and the s3ok/s4ok/s5ok
    * survivor flags. */
  private def flaggedDocs(
      docs: DataFrame, probes: DataFrame,
      id: Column, text: Column, source: Column, lang: Column,
      minQuality: Double,
      shingleWords: Int, numHashes: Int, bands: Int,
      contamN: Int): DataFrame = {
    // materialized ONCE: the quality/lang-id regex battery is the single
    // most expensive row-local stage here, and `base` fans into every
    // downstream branch (the s2 filter, the cluster-quality join, and
    // the final flag join-back) — without the barrier each branch
    // re-scores the corpus
    val base = graft.Mat(docs.select(
        id.cast("long").as("doc_id"), source.as("source"),
        lang.as("lang"), text.as("text"),
        TextFunctions.qualityScore(text).as("quality"),
        TextFunctions.langId(text).as("pred_lang"),
        TextFunctions.tokenCountWs(text).cast("long").as("n_tok"))
      .withColumn("pass_q", col("quality") >= minQuality)
      .withColumn("pass_l", col("pass_q") && col("pred_lang") === col("lang")))

    // stage 3: exact keep-first on the language survivors
    val s2 = base.filter(col("pass_l"))
    val fps = s2.select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
    val exactKeep = fps.join(
        fps.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id")), Seq("fp"))
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), lit(true).as("pass_e"))
    val s3 = s2.join(exactKeep.select(col("doc_id")), Seq("doc_id"))

    // stage 4: LSH clusters on what's left; drop all but the best-quality
    // member of each cluster (singletons never pair, so they survive)
    val pairs = Dedup.minHashLshPairs(s3, col("doc_id"), col("text"),
      shingleWords, numHashes, bands)
    val comp = Components.connectedComponents(pairs, "id_a", "id_b")
    val members = comp.join(
      s3.select(col("doc_id").as("qid"), col("quality")),
      col("node") === col("qid"))
    val keep = Joins.top1PerGroup(members, Seq(col("component")),
        Seq(col("quality").desc, col("node").asc))
      .select(col("component"), col("node").as("keep_id"))
    val nearDrop = members.join(keep, Seq("component"))
      .filter(col("node") =!= col("keep_id"))
      .select(col("node").as("doc_id"), lit(true).as("near_drop"))
    val s4 = s3.join(nearDrop, Seq("doc_id"), "left_anti")

    // stage 5: strict decontamination — any shared distinct contamN-gram
    // with the probe set drops the doc. The probe gram set is
    // benchmark-sized, so the semi join broadcasts under AQE.
    val corpusGrams = Dedup.wordShingles(s4, col("doc_id"), col("text"), contamN)
    val probeGrams = Dedup.wordShingles(probes, lit(0L), text, contamN)
      .select(col("sh")).distinct()
    val contamDocs = corpusGrams.join(probeGrams, Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct().withColumn("contam", lit(true))

    base.join(exactKeep, Seq("doc_id"), "left")
      .join(nearDrop, Seq("doc_id"), "left")
      .join(contamDocs, Seq("doc_id"), "left")
      .withColumn("s3ok", col("pass_l") && coalesce(col("pass_e"), lit(false)))
      .withColumn("s4ok", col("s3ok") && !coalesce(col("near_drop"), lit(false)))
      .withColumn("s5ok", col("s4ok") && !coalesce(col("contam"), lit(false)))
  }

  def curationFunnel(
      docs: DataFrame, probes: DataFrame,
      id: Column, text: Column, source: Column, lang: Column,
      minQuality: Double = 0.5,
      shingleWords: Int = 3, numHashes: Int = 16, bands: Int = 4,
      contamN: Int = 5): DataFrame =
    // one pass over the flagged base: conditional sums per (source, lang)
    flaggedDocs(docs, probes, id, text, source, lang,
      minQuality, shingleWords, numHashes, bands, contamN)
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pass_q"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("pass_l"), 1L).otherwise(0L)).as("n_lang"),
        sum(when(col("s3ok"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("s4ok"), 1L).otherwise(0L)).as("n_near"),
        sum(when(col("s5ok"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("s5ok"), col("n_tok")).otherwise(0L)).as("tokens_kept"))
      .withColumn("retention", round(col("n_kept") / col("n_docs"), 6))

  /** Per-doc audit log of the funnel: one row per corpus document with
    * the FIRST stage that dropped it (`quality`, `lang`, `exact_dup`,
    * `near_dup`, `contaminated`) or `kept` — the data-governance answer
    * to "why is my document not in the training set". Same flagged
    * substrate as [[curationFunnel]]; output is corpus-sized (one row
    * per doc), so it is a write-to-table surface, not a collect. */
  def curationDropLog(
      docs: DataFrame, probes: DataFrame,
      id: Column, text: Column, source: Column, lang: Column,
      minQuality: Double = 0.5,
      shingleWords: Int = 3, numHashes: Int = 16, bands: Int = 4,
      contamN: Int = 5): DataFrame =
    flaggedDocs(docs, probes, id, text, source, lang,
      minQuality, shingleWords, numHashes, bands, contamN)
      .select(col("doc_id"), col("source"), col("lang"), col("quality"),
        col("pred_lang"), col("n_tok"),
        when(!col("pass_q"), lit("quality"))
          .when(!col("pass_l"), lit("lang"))
          .when(!col("s3ok"), lit("exact_dup"))
          .when(!col("s4ok"), lit("near_dup"))
          .when(!col("s5ok"), lit("contaminated"))
          .otherwise(lit("kept")).as("verdict"))
}
