package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Scale design: brute force is the correctness baseline (queries × corpus
  * is a broadcast-join when the query set is small — the common "probe"
  * shape); the LSH path buckets the corpus once (narrow, no shuffle) and
  * then only joins within buckets, which is the 100 TB-viable shape.
  */
object Similarity {

  /** Uses the codegen'd native cosine_sim expression when GraftExtensions
    * is on the session, the composable HOF fold otherwise — results are
    * bit-identical (same accumulation order). */
  private def cosineCol(df: DataFrame)(a: Column, b: Column): Column =
    if (df.sparkSession.catalog.functionExists("cosine_sim"))
      VectorFunctions.cosineNative(a, b)
    else VectorFunctions.cosine(a, b)

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors by cosine similarity. Query set should be small enough to
    * broadcast (driver enforces nothing — caller picks the side).
    */
  def bruteForceCosineTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int): DataFrame = {
    val q = queries.select(col(qId).as("query_id"),
      VectorFunctions.toDoubleArray(col(qVec)).as("qv"))
    val c = corpus.select(col(cId).as("neighbor_id"),
      VectorFunctions.toDoubleArray(col(cVec)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosineCol(corpus)(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nlist` cells
    * around deterministic seed centroids (lowest-id vector per id-residue
    * class — no RNG, reproducible across runs), then answer queries by
    * probing the `nprobe` nearest cells with exact rerank inside.
    *
    * Scale shape: centroids are broadcast (nlist is small); corpus
    * assignment is one narrow pass; the probe join shuffles only on
    * cell id. Recall/cost dial = nprobe/nlist.
    */
  def ivfCosineTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col(cId).as("neighbor_id"),
      VectorFunctions.toDoubleArray(col(cVec)).as("cv"))
    val centroids = broadcast(
      Joins.top1PerGroup(
        c.withColumn("cell", pmod(col("neighbor_id"), lit(nlist))),
        Seq(col("cell")), Seq(col("neighbor_id")))
        .select(col("cell"), col("cv").as("centroid")))
    // rounded similarity + cell tiebreak: cell assignment is deterministic
    // and engine-replicable (float ties cannot flip cells across engines)
    val assigned = Joins.top1PerGroup(
      c.crossJoin(centroids)
        .withColumn("cdist", round(cosineCol(corpus)(col("cv"), col("centroid")), 6)),
      Seq(col("neighbor_id")), Seq(col("cdist").desc, col("cell").asc))
      .select(col("neighbor_id"), col("cv"), col("cell"))
    val q = queries.select(col(qId).as("query_id"),
      VectorFunctions.toDoubleArray(col(qVec)).as("qv"))
    val probes = q.crossJoin(centroids)
      .withColumn("cdist", round(cosineCol(corpus)(col("qv"), col("centroid")), 6))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist").desc, col("cell").asc)))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosineCol(corpus)(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Multi-probe LSH ANN: like [[lshCosineTopK]], but each query also
    * probes the `nPlanes` Hamming-distance-1 neighbor buckets (one sign
    * bit flipped). Standard recall/cost dial (Lv et al. 2007): probes
    * cost |query side| x (nPlanes+1) exploded rows — query-side only, the
    * corpus is still bucketed once and joined equi on the bucket id. */
  def lshMultiProbeTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, dim: Int, nPlanes: Int = 8): DataFrame = {
    val nativeDot = corpus.sparkSession.catalog.functionExists("dot_product")
    val q = queries.select(col(qId).as("query_id"),
        VectorFunctions.toDoubleArray(col(qVec)).as("qv"))
      .withColumn("bucket",
        VectorFunctions.lshBucket(col("qv"), dim, nPlanes, native = nativeDot))
      .withColumn("probe", explode(array(
        col("bucket") +: (0 until nPlanes).map(p =>
          col("bucket").bitwiseXOR(lit(1 << p))): _*)))
      .select(col("query_id"), col("qv"), col("probe").as("bucket"))
    val c = corpus.select(col(cId).as("neighbor_id"),
        VectorFunctions.toDoubleArray(col(cVec)).as("cv"))
      .withColumn("bucket",
        VectorFunctions.lshBucket(col("cv"), dim, nPlanes, native = nativeDot))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosineCol(corpus)(col("qv"), col("cv")), 6).as("cos"))
      .distinct() // a pair can match via several probes; score is identical
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** LSH-bucketed ANN: random-hyperplane buckets, exact rerank within the
    * bucket. Trades recall for a corpus-sized scan with no all-pairs
    * shuffle — the scale path. */
  def lshCosineTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, dim: Int, nPlanes: Int = 8): DataFrame = {
    val nativeDot = corpus.sparkSession.catalog.functionExists("dot_product")
    val q = queries.select(col(qId).as("query_id"),
        VectorFunctions.toDoubleArray(col(qVec)).as("qv"))
      .withColumn("bucket",
        VectorFunctions.lshBucket(col("qv"), dim, nPlanes, native = nativeDot))
    val c = corpus.select(col(cId).as("neighbor_id"),
        VectorFunctions.toDoubleArray(col(cVec)).as("cv"))
      .withColumn("bucket",
        VectorFunctions.lshBucket(col("cv"), dim, nPlanes, native = nativeDot))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosineCol(corpus)(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Late-interaction retrieval (MaxSim, ColBERT-style — Khattab &
    * Zaharia 2020, public): every query and document is a BAG of token
    * vectors; score(q, d) = sum over q's tokens of the max cosine
    * against d's tokens. Catches term-level matches a single pooled
    * vector blurs away.
    *
    * `queries` rows: (queryDoc, queryTok, vec); `corpus` rows:
    * (corpusDoc, vec). The query bag broadcasts (probe-shaped workload);
    * the corpus streams through one scored pass, then two hash
    * aggregates (max per query token, DECIMAL-exact sum per doc — the
    * per-token maxima are rounded first, so the final sum is
    * aggregation-order-independent) and a per-query top-k window. */
  def maxSimTopK(
      queries: DataFrame, corpus: DataFrame,
      qDoc: String, qTok: String, qVec: String,
      cDoc: String, cVec: String, k: Int): DataFrame = {
    val q = queries.select(col(qDoc).as("query_doc"), col(qTok).as("__qtok"),
      VectorFunctions.toDoubleArray(col(qVec)).as("qv"))
    val c = corpus.select(col(cDoc).as("doc_id"),
      VectorFunctions.toDoubleArray(col(cVec)).as("cv"))
    val perTok = c.crossJoin(broadcast(q))
      .filter(col("doc_id") =!= col("query_doc"))
      .groupBy(col("query_doc"), col("__qtok"), col("doc_id"))
      .agg(max(round(cosineCol(corpus)(col("qv"), col("cv")), 6))
        .cast("decimal(10,6)").as("__mx"))
    val scored = perTok.groupBy(col("query_doc"), col("doc_id"))
      .agg(sum(col("__mx")).as("__score"))
    val w = Window.partitionBy(col("query_doc"))
      .orderBy(col("__score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_doc"), col("doc_id"),
        col("__score").cast("double").as("maxsim"), col("rank"))
  }
}
