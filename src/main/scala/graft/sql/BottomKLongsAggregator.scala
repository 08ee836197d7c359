package graft.sql

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded bottom-k aggregator over longs: keeps the k SMALLEST
  * distinct values per group — the KMV (k-minimum-values) sketch build
  * step. Same contract as [[TopKAggregator]]: O(k) buffer, map-side
  * merge, insertion-order-independent (buffer kept sorted ascending;
  * a full buffer rejects values >= its max in O(k)).
  *
  * Inputs are assumed pre-distinct (KMV hashes a distinct element
  * frame); duplicates that do arrive are dropped on insert, so the
  * sketch is a distinct k-min either way.
  */
case class BottomKLongsAggregator(k: Int)
  extends Aggregator[Long, List[Long], List[Long]] {

  override def zero: List[Long] = Nil

  override def reduce(buf: List[Long], in: Long): List[Long] =
    if (buf.lengthCompare(k) >= 0 && in >= buf.last) buf
    else if (buf.contains(in)) buf
    else {
      val (lo, hi) = buf.span(_ < in)
      (lo ::: in :: hi).take(k)
    }

  override def merge(a: List[Long], b: List[Long]): List[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: List[Long]): List[Long] = buf.distinct.sorted.take(k)

  override def bufferEncoder: Encoder[List[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[List[Long]] = ExpressionEncoder()
}
