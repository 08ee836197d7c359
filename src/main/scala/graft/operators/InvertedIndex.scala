package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted index (posting lists) over a text corpus — the retrieval-side
  * twin of the dedup/similarity operators: term -> document frequency,
  * collection frequency, and a bounded posting list.
  *
  * Scale shape: one explode of the corpus into (doc, term) pairs, then two
  * hash aggregates with map-side partials — the same posture as TF-IDF.
  * The posting list is CAPPED at `maxPostings` ids (lowest doc ids first,
  * deterministic): full postings for a stop-word-like term would be a
  * corpus-sized array in one row — the classic hot-key explosion — so the
  * bounded prefix plus the exact df/cf counts is the 100 TB-safe contract.
  * Callers needing full postings for a term range filter first and explode
  * the pairs frame instead.
  */
object InvertedIndex {

  /** (doc_id, term, tf) pairs — whitespace tokenization, blanks dropped. */
  def termPairs(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.cast("long").as("doc_id"),
        explode(split(trim(text), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** The index: term -> df (documents containing it), cf (total
    * occurrences), and the first `maxPostings` doc ids ascending as a
    * comma-joined string (canonical scalar form — hash-comparable across
    * engines, no array columns in the output). */
  def build(df: DataFrame, id: Column, text: Column, maxPostings: Int): DataFrame =
    termPairs(df, id, text)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        array_join(slice(sort_array(collect_list(col("doc_id"))), 1, maxPostings), ",")
          .as("postings"))
}
