package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 64-bit SimHash aggregate over md5-hex token columns: the
  * buffer holds 64 signed counters; each input row adds ±1 per bit from
  * the first 16 hex nibbles of the token's md5 (bit j reads bit (j mod 4)
  * of nibble j/4 — identical indexing to the declarative 64-column
  * formulation in graft.dedup.Dedup and the DuckDB oracle, so results are
  * hash-identical). Replaces 64 `sum(when(...))` aggregation columns with
  * one imperative aggregate: the hash-aggregate update is a single
  * 16-nibble loop per row instead of 64 expression trees, and the merge
  * is elementwise addition — the standard map-side-combine shape, so
  * only 64 ints per (doc, partition) shuffle.
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Int]] {

  private val Bits = 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](Bits)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = v.asInstanceOf[UTF8String].toString
      // robust against arbitrary SQL input: accept either hex case and
      // treat missing/invalid nibbles as 0 (engine callers always pass
      // 32-char lowercase md5 hex, which takes the fast path)
      val n = math.min(Bits / 4, hex.length)
      var p = 0
      while (p < n) {
        val c = hex.charAt(p)
        val nib =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else 0
        var b = 0
        while (b < 4) {
          val j = p * 4 + b
          buffer(j) += (((nib >> b) & 1) << 1) - 1 // +1 if bit set, else -1
          b += 1
        }
        p += 1
      }
      // absent nibbles contribute -1 per bit (same as an all-zero nibble)
      var j = n * 4
      while (j < Bits) { buffer(j) -= 1; j += 1 }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < Bits) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (buffer(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(Bits * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(Bits)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimhashAgg =
    copy(child = newChildren.head)
}

object SimhashAgg {

  /** Column surface: simhash of a column of md5-hex strings. */
  def simhash64(hexCol: Column): Column =
    Bridge.column(SimhashAgg(Bridge.expression(hexCol)).toAggregateExpression())
}
