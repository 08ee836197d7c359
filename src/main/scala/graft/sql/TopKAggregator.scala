package graft.sql

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator: keeps at most k (value, id) pairs per
  * group, ordered by value DESC with id ASC tiebreak.
  *
  * The window-function formulation (`row_number <= k`) sorts every group
  * fully; this Aggregator's buffer is O(k) and merges map-side — at a
  * billion rows per group the shuffle carries k pairs, not the group.
  * (SURVEY §7.3 lists a typed Aggregator as the sanctioned escape hatch
  * beyond pure column expressions.)
  *
  * Deterministic: insertion order cannot affect the result because the
  * buffer is re-sorted on every merge boundary.
  */
case class TopKAggregator(k: Int)
  extends Aggregator[(Double, Long), List[(Double, Long)], List[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (v, id) => (-v, id) }

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sorted(ord).take(k)

  override def zero: List[(Double, Long)] = Nil

  /** Buffer invariant: sorted by `ord`, length <= k. A full buffer rejects
    * inputs not better than its current minimum in O(k) without re-sorting
    * (the naive `trim(in :: buf)` is O(k log k) per input row). */
  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    if (buf.lengthCompare(k) >= 0 && ord.gteq(in, buf.last)) buf
    else {
      val (better, worse) = buf.span(x => ord.lt(x, in))
      (better ::: in :: worse).take(k)
    }

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: List[(Double, Long)]): List[(Double, Long)] = trim(buf)

  override def bufferEncoder: Encoder[List[(Double, Long)]] = ExpressionEncoder()

  override def outputEncoder: Encoder[List[(Double, Long)]] = ExpressionEncoder()
}
