package graft.tools

import org.apache.spark.sql.functions._

/** Scale-up replica generator for scaling experiments: writes `copies`
  * disjoint key-shifted copies of orders + lineitem (the flagship's and
  * the core join/agg queries' only inputs) so the SAME queries can be
  * timed at N x the gate scale. Keys shift by copy * (max+1) so key
  * cardinality scales with row count and per-key densities stay constant
  * — a faithful N x workload, not a hot-key pileup. Dimension tables are
  * copied through unchanged.
  *
  * Usage: ScaleGen <srcSfDir> <outDir> <copies> [docsMode]
  * (run via the Bench classpath: java -cp target/...:/opt/spark/jars/\*)
  *
  * docsMode `suffix` (default) word-suffixes each copy's text so the
  * corpus is `copies` DISJOINT shards — the honest linear baseline for
  * dedup (verbatim replication would square pair counts). docsMode
  * `verbatim` keeps texts identical across copies (only ids shift):
  * the cross-shard-duplicate stress a crawl corpus actually has, and
  * the right workload for operators whose regex/scoring stages would
  * be broken by suffixed words (lang-id markers, stopword ratios).
  */
object ScaleGen {
  /** max(key)+1 with a descriptive failure on an empty/all-null table
    * (a bare getLong(0) NPEs with no context). */
  private def shiftBase(
      df: org.apache.spark.sql.DataFrame, key: String, table: String): Long = {
    val row = df.agg(max(key)).head
    require(!row.isNullAt(0),
      s"ScaleGen: table '$table' is empty or '$key' is all-null — " +
        "cannot derive a key shift; regenerate the source scale factor")
    row.getLong(0) + 1
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val verbatimDocs = args.length > 3 && args(3) == "verbatim"
    val spark = graft.GraftSession.getOrCreate("graft-scalegen")

    val o = spark.read.parquet(s"$src/orders.parquet")
    val l = spark.read.parquet(s"$src/lineitem.parquet")
    val oShift = shiftBase(o, "o_orderkey", "orders")
    val cShift = shiftBase(o, "o_custkey", "orders")

    val cSeq = explode(sequence(lit(0L), lit(copies - 1L))).as("__c")
    o.select(col("*"), cSeq)
      .withColumn("o_orderkey", col("o_orderkey") + col("__c") * oShift)
      .withColumn("o_custkey", col("o_custkey") + col("__c") * cShift)
      .drop("__c")
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    l.select(col("*"), cSeq)
      .withColumn("l_orderkey", col("l_orderkey") + col("__c") * oShift)
      .drop("__c")
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // documents scale as INDEPENDENT shards: every word gets a per-copy
    // suffix, so cross-copy shingles/chunks never match and the corpus'
    // duplicate structure is exactly `copies` disjoint images of the
    // original — the honest linear-scaling baseline for dedup operators
    // (replicating texts verbatim would grow pair counts quadratically)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val dShift = shiftBase(docs, "doc_id", "documents")
    val docsScaled = docs.select(col("*"), cSeq)
      .withColumn("doc_id", col("doc_id") + col("__c") * dShift)
    (if (verbatimDocs) docsScaled
     else docsScaled.withColumn("text", array_join(
       transform(split(col("text"), " "),
         w => concat(w, lit("_"), col("__c"))), " ")))
      .drop("__c")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    // embeddings: circular dimension shift per copy — norms and within-copy
    // similarity structure preserved, cross-copy cosines decorrelated.
    // Shift modulo the dimension: copies beyond dim wrap (slice length
    // must stay >= 0 — at copies > dim the raw offset went negative)
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val eShift = shiftBase(emb, "vec_id", "embeddings")
    emb.select(col("*"), cSeq)
      .withColumn("vec_id", col("vec_id") + col("__c") * eShift)
      .withColumn("__s", pmod(col("__c").cast("int"), size(col("embedding"))))
      .withColumn("embedding", concat(
        slice(col("embedding"), col("__s") + 1,
          size(col("embedding")) - col("__s")),
        slice(col("embedding"), lit(1), col("__s"))))
      .drop("__c", "__s")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // events: disjoint id/user shifts per copy; timestamps unchanged, so
    // per-day volumes scale uniformly x copies (seasonal/drift structure
    // preserved, per-user densities constant). Loaded via Tables.events
    // so either ts encoding round-trips.
    val evt = graft.Tables.events(spark, src)
    val evShift = shiftBase(evt, "event_id", "events")
    val uShift = shiftBase(evt, "user_id", "events")
    evt.select(col("*"), cSeq)
      .withColumn("event_id", col("event_id") + col("__c") * evShift)
      .withColumn("user_id", col("user_id") + col("__c") * uShift)
      .drop("__c")
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    spark.stop()
  }
}
