package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature aggregate: for each input string the
  * update computes `seeds` MD5 digests of (s + "#" + seed) at the BYTE
  * level and folds the four big-endian unsigned 32-bit chunks of each
  * into a running elementwise minimum — value-identical to the
  * declarative `min(conv(substring(md5(concat(s, '#seed')), 1+8c, 8),
  * 16, 10))` formulation the DuckDB oracle replays (hex substring
  * (1+8c, 8) is exactly digest bytes 4c..4c+3), without materializing
  * hex strings or running 4×seeds separate aggregation columns. Merge
  * is elementwise min — the map-side-combine shape: 4×seeds longs per
  * (doc, partition) shuffle.
  */
case class MinhashAgg(
    child: Expression,
    seeds: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(seeds >= 1 && seeds <= 9, "seed suffix is a single digit")
  private val K = seeds * 4

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): Array[Long] = Array.fill(K)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) MinhashAgg.updateInto(md, buffer, v.asInstanceOf[UTF8String].getBytes, seeds)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) { if (other(i) < buffer(i)) buffer(i) = other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(K * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(K)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinhashAgg =
    copy(child = newChildren.head)
}

object MinhashAgg {

  /** Column surface: array of seeds×4 minhash values of a string column. */
  def minhashes(col: Column, seeds: Int): Column =
    Bridge.column(MinhashAgg(Bridge.expression(col), seeds).toAggregateExpression())

  /** Folds one input string into the running elementwise-minimum buffer —
    * the ONE definition of the minhash arithmetic, shared by the
    * aggregate (per shingle row) and the scalar [[MinhashArray]] (per
    * shingle array element) so the two can never drift.
    */
  private[functions] def updateInto(
      md: java.security.MessageDigest,
      buffer: Array[Long],
      base: Array[Byte],
      seeds: Int
  ): Unit = {
    var seed = 0
    while (seed < seeds) {
      md.reset()
      md.update(base)
      md.update('#'.toByte)
      md.update(('0' + seed).toByte)
      val d = md.digest()
      var c = 0
      while (c < 4) {
        val h = ((d(4 * c) & 0xffL) << 24) | ((d(4 * c + 1) & 0xffL) << 16) |
          ((d(4 * c + 2) & 0xffL) << 8) | (d(4 * c + 3) & 0xffL)
        val i = seed * 4 + c
        if (h < buffer(i)) buffer(i) = h
        c += 1
      }
      seed += 1
    }
  }
}

/** Scalar per-row MinHash: the signature of a shingle ARRAY, value-
  * identical to running [[MinhashAgg]] over the exploded shingles (the
  * digest arithmetic is the shared [[MinhashAgg.updateInto]]). Exists
  * for the STREAMING ingest gate, where a per-doc signature must come
  * from a stateless map — an explode + aggregate would be a stateful
  * streaming aggregation. Returns null for an empty/zero-shingle array
  * (such docs take only the exact-hash path, mirroring the index's
  * mh-null rows).
  */
case class MinhashArray(child: Expression, seeds: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(seeds >= 1 && seeds <= 9, "seed suffix is a single digit")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val buf = Array.fill(seeds * 4)(Long.MaxValue)
    var i = 0
    while (i < n) {
      MinhashAgg.updateInto(md, buf, arr.getUTF8String(i).getBytes, seeds)
      i += 1
    }
    new GenericArrayData(buf)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashArray =
    copy(child = newChild)
}

object MinhashArray {
  def minhashArray(col: Column, seeds: Int): Column =
    Bridge.column(MinhashArray(Bridge.expression(col), seeds))
}
