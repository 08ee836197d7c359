package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tokenizer application and sequence packing — the last relational steps
  * before a training corpus leaves the engine as fixed-length sequences.
  */
object Tokenize {

  /** Corpus-induced vocabulary: the `v` most frequent terms by collection
    * frequency (ties broken by term), ids 0..v-1 in (cf desc, term) order.
    * Top-v is sort+limit (TakeOrderedAndProject); the id window then runs
    * over v rows — vocabulary-sized, not corpus-sized. */
  def vocabTopN(df: DataFrame, id: Column, text: Column, v: Int): DataFrame = {
    val cf = InvertedIndex.termPairs(df, id, text)
      .groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val w = Window.partitionBy().orderBy(col("cf").desc, col("term").asc)
    cf.orderBy(col("cf").desc, col("term").asc).limit(v)
      .withColumn("tok_id", row_number().over(w).cast("long") - 1)
  }

  /** Encode each document as its token-id sequence under `vocab`
    * (out-of-vocabulary -> -1), comma-joined in position order (canonical
    * scalar output). The vocab side is bounded by construction -> AQE
    * broadcasts the join; the corpus side shuffles once on doc_id for the
    * ordered re-assembly. */
  def encodeWithVocab(df: DataFrame, id: Column, text: Column, vocab: DataFrame): DataFrame =
    df.select(id.cast("long").as("doc_id"),
        posexplode(split(trim(text), "\\s+")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .join(vocab.select(col("term"), col("tok_id")), Seq("term"), "left")
      .withColumn("tok_id", coalesce(col("tok_id"), lit(-1L)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok_id")))),
          s => s.getField("tok_id")), ",").as("token_ids"))

  /** Deterministic sequence packing: within each `group` (a source, a
    * shard), documents in `orderCol` order fill fixed-budget sequences of
    * `seqLen` tokens; a document lands in the sequence its RUNNING token
    * total (exclusive) falls into. One window over the group — the
    * relational approximation of greedy packing that any engine can
    * replay (no per-bin mutable state). Documents longer than `seqLen`
    * still get a bin (they'd be split downstream). */
  def seqPack(
      df: DataFrame, group: Column, orderCol: Column, nTokens: Column,
      seqLen: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(nTokens).over(w))
      .withColumn("seq_id", floor((col("__cum") - nTokens) / seqLen).cast("long"))
      .drop("__cum")
  }
}
