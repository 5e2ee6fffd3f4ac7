package graft.similarity

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: (neighbor id, cosine). */
case class Scored(neighbor_id: Long, cosine: Double)

/** Typed map-side top-k aggregator: each partition keeps only its local
  * k best candidates (bounded buffer), partials merge associatively —
  * so a per-query top-k over a 100 TB corpus shuffles k rows per
  * (query, partition) instead of every scored row, which is what the
  * window/row_number formulation would do.
  *
  * Ordering matches the window variant exactly: cosine descending,
  * neighbor_id ascending on ties — so the same DuckDB oracle applies.
  */
class TopKByCosine(k: Int) extends Aggregator[Scored, List[Scored], List[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.cosine > b.cosine || (a.cosine == b.cosine && a.neighbor_id < b.neighbor_id)

  private def insert(buf: List[Scored], s: Scored): List[Scored] = {
    val merged = (s :: buf).sortWith(better)
    if (merged.size > k) merged.take(k) else merged
  }

  override def zero: List[Scored] = Nil
  override def reduce(buf: List[Scored], s: Scored): List[Scored] = insert(buf, s)
  override def merge(a: List[Scored], b: List[Scored]): List[Scored] = {
    val merged = (a ++ b).sortWith(better)
    if (merged.size > k) merged.take(k) else merged
  }
  override def finish(buf: List[Scored]): List[Scored] = buf.sortWith(better)
  override def bufferEncoder: Encoder[List[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[List[Scored]] = bufferEncoder
}
