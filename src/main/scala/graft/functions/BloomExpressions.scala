package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a driver-built
  * [[org.apache.spark.util.sketch.BloomFilter]] (Spark's public sketch
  * — the same structure its runtime-filter join optimization injects).
  * The filter rides into codegen as a referenced object, so probing
  * stays inside whole-stage codegen next to the md5 computation — no
  * UDF boundary, no serialization per row. Never false-negative by
  * construction; false positives are whatever fpp the builder chose.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = BooleanType

  // reject non-string children at analysis time, not as a runtime
  // ClassCastException / codegen compile error from .getBytes()
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)

  override def nullSafeEval(a: Any): Any =
    bloom.mightContainBinary(a.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.mightContainBinary($a.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  def mightContain(c: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), bloom))
}
