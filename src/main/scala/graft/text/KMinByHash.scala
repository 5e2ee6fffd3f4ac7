package graft.text

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One selectable row: deterministic hash order key + its document. */
case class HashRanked(h: Long, doc_id: Long)

/** Typed k-min-by-(hash, doc_id) aggregator — the keyed generalization
  * of KMinValues (q23): per group, keep the k rows with the smallest
  * (h, doc_id) in a bounded buffer. Partials combine map-side, so a
  * per-stratum selection ships k rows per (stratum, partition) where a
  * window/row_number formulation would funnel every stratum's rows
  * through one task (fatal when strata are few and the corpus is not).
  */
class KMinByHash(k: Int) extends Aggregator[HashRanked, List[HashRanked], List[HashRanked]] {

  private def lt(a: HashRanked, b: HashRanked): Boolean =
    a.h < b.h || (a.h == b.h && a.doc_id < b.doc_id)

  override def zero: List[HashRanked] = Nil

  override def reduce(buf: List[HashRanked], r: HashRanked): List[HashRanked] =
    if (buf.sizeIs >= k && !lt(r, buf.last)) buf
    else {
      val merged = (r :: buf).sortWith(lt)
      if (merged.sizeIs > k) merged.take(k) else merged
    }

  override def merge(a: List[HashRanked], b: List[HashRanked]): List[HashRanked] = {
    val merged = (a ++ b).sortWith(lt)
    if (merged.sizeIs > k) merged.take(k) else merged
  }

  override def finish(buf: List[HashRanked]): List[HashRanked] = buf.sortWith(lt)
  override def bufferEncoder: Encoder[List[HashRanked]] = ExpressionEncoder[List[HashRanked]]()
  override def outputEncoder: Encoder[List[HashRanked]] = bufferEncoder
}
