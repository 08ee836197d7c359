package graft.sources

import java.security.MessageDigest
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-corpus DataSource V2 with REAL pushdown.
  *
  * The reference materializes synthetic/bridge tables by writing them out
  * first (SURVEY §2.1 S2/S3 — staging tables re-read by every transform);
  * on Spark the idiomatic equivalent is a connector that GENERATES rows on
  * demand inside the scan, so there is nothing to store and the scan
  * parallelism is declared, not inherited from files.
  *
  * Design notes (the 100 TB posture):
  *   - `doc_id` is the generator's ordinal, so range predicates on it are
  *     not filtered — they are *pushed into the generator*: the scan narrows
  *     its [lo, hi) range and never materializes the excluded ids. This is
  *     the DSv2 contract the parquet reader uses for row-group skipping,
  *     exercised here on a computed source.
  *   - Column pruning is honored structurally: the reader computes ONLY the
  *     requested columns (an unrequested `md5` is never evaluated).
  *   - Rows derive from md5("gen-" || doc_id), replayable in any engine
  *     (the DuckDB oracle replays the exact derivation in SQL).
  *
  * Usage: spark.read.format("graft.sources.GenSource")
  *   .option("n", 10000).option("slices", 8).load()
  *
  * Schema: doc_id BIGINT, source STRING, lang STRING, tokens INT, score DOUBLE.
  */
class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GenSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new GenTable
  override def supportsExternalMetadata(): Boolean = false
}

object GenSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("tokens", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  val sources: Array[String] = Array("web", "books", "code", "wiki")
  val langs: Array[String]   = Array("en", "de", "fr", "es", "pt")

  private val hexDigits = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = {
    val d  = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    var i  = 0
    while (i < d.length) {
      sb.append(hexDigits((d(i) >> 4) & 0xf)); sb.append(hexDigits(d(i) & 0xf)); i += 1
    }
    sb.toString
  }

  /** The row derivation — the single source of truth the oracle replays:
    * h = md5('gen-' || id); a,b,c = first three 32-bit hex words of h. */
  def derive(id: Long): (Long, Long, Long) = {
    val h = md5Hex("gen-" + id)
    (java.lang.Long.parseLong(h.substring(0, 8), 16),
     java.lang.Long.parseLong(h.substring(8, 16), 16),
     java.lang.Long.parseLong(h.substring(16, 24), 16))
  }
}

private[sources] class GenTable extends Table with SupportsRead {
  override def name(): String = "graft_gen"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(
      n = options.getLong("n", 1000L),
      slices = options.getInt("slices", 4))
}

/** Accepts range/equality predicates on doc_id by narrowing the generated
  * [lo, hi) interval; everything else stays a Spark-side residual. */
private[sources] class GenScanBuilder(n: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = n
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GenSource.schema

  private def num(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong); case l: Long => Some(l)
    case s: Short => Some(s.toLong); case b: Byte => Some(b.toLong)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThanOrEqual("doc_id", v) => num(v).exists { x => lo = math.max(lo, x); true }
      case GreaterThan("doc_id", v)        => num(v).exists { x => lo = math.max(lo, x + 1); true }
      case LessThan("doc_id", v)           => num(v).exists { x => hi = math.min(hi, x); true }
      case LessThanOrEqual("doc_id", v)    => num(v).exists { x => hi = math.min(hi, x + 1); true }
      case EqualTo("doc_id", v) =>
        num(v).exists { x => lo = math.max(lo, x); hi = math.min(hi, x + 1); true }
      case IsNotNull("doc_id") => true // generator never emits nulls
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new GenScan(lo, math.max(lo, hi), slices, required, pushed)
}

private[sources] class GenScan(
    lo: Long, hi: Long, slices: Int, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GenScan range=[$lo,$hi) slices=$slices cols=${required.fieldNames.mkString(",")} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val total = hi - lo
    if (total <= 0) Array.empty
    else {
      val k = math.min(slices.toLong, total).toInt
      (0 until k).map { i =>
        GenRange(lo + i * total / k, lo + (i + 1) * total / k)
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required.fieldNames)
}

private[sources] case class GenRange(start: Long, end: Long) extends InputPartition

private[sources] class GenReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[GenRange]
    new GenReader(r.start, r.end, cols)
  }
}

/** Computes only the pruned columns; hashes only when a derived column is
  * actually requested. */
private[sources] class GenReader(start: Long, end: Long, cols: Array[String])
    extends PartitionReader[InternalRow] {

  private var id = start - 1
  private val needsHash = cols.exists(c => c != "doc_id")

  override def next(): Boolean = { id += 1; id < end }

  override def get(): InternalRow = {
    val (a, b, c) = if (needsHash) GenSource.derive(id) else (0L, 0L, 0L)
    val values = cols.map {
      case "doc_id" => id
      case "source" => UTF8String.fromString(GenSource.sources((a % 4).toInt))
      case "lang"   => UTF8String.fromString(GenSource.langs((b % 5).toInt))
      case "tokens" => 50 + (c % 951).toInt
      case "score"  => a.toDouble / 4294967296.0
      case other    => throw new IllegalArgumentException(s"unknown column $other")
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = ()
}
