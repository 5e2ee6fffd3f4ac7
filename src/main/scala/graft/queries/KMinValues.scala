package graft.queries

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Finished KMV sketch state: the k-th smallest distinct hash (the
  * estimator's normalizer) and how many distinct hashes were seen (< k
  * means the sketch is exact).
  */
case class KmvSketch(kth: Long, k_seen: Long)

/** Typed k-minimum-values aggregator: per group, keep the k smallest
  * DISTINCT hash values in a bounded buffer. This is the scale-safe
  * selection for the KMV distinct sketch — partials combine map-side and
  * each partition ships at most k longs per group, where the
  * window/row_number formulation funnels EVERY distinct hash of a group
  * through one task to be ranked (fatal when the group key has few
  * values: 3 tasks for 3 return flags, at any corpus size).
  *
  * Buffer is an ascending sorted distinct list of size ≤ k; k is small
  * (64), so the O(k) insert is cheaper than any tree once map-side
  * partial aggregation has collapsed rows per partition.
  */
class KMinValues(k: Int) extends Aggregator[Long, List[Long], KmvSketch] {

  override def zero: List[Long] = Nil

  override def reduce(buf: List[Long], h: Long): List[Long] =
    // full buffer and h beyond its max: the common steady-state, O(1)-ish
    if (buf.sizeIs >= k && h >= buf.last) buf
    else if (buf.contains(h)) buf
    else {
      val merged = (h :: buf).sorted
      if (merged.sizeIs > k) merged.take(k) else merged
    }

  override def merge(a: List[Long], b: List[Long]): List[Long] = {
    val merged = (a ++ b).distinct.sorted
    if (merged.sizeIs > k) merged.take(k) else merged
  }

  override def finish(buf: List[Long]): KmvSketch =
    KmvSketch(if (buf.isEmpty) 0L else buf.last, buf.size.toLong)

  override def bufferEncoder: Encoder[List[Long]] = ExpressionEncoder[List[Long]]()
  override def outputEncoder: Encoder[KmvSketch] = Encoders.product[KmvSketch]
}
