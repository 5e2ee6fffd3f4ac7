package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expressions for the vector hot path. The higher-order
  * `aggregate(zip_with(...))` formulation is semantically identical but
  * runs interpreted (lambda machinery per element); these compile to a
  * tight primitive loop inside whole-stage codegen — the difference is
  * ~5-10× on the LSH/ANN candidate-verification stages.
  *
  * Semantics are EXACTLY the left-fold double accumulation the DuckDB
  * oracles replay: acc := acc + (double)a[i] * (double)b[i], i ascending.
  */
case class FloatDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of a float-array column against a constant double vector
  * (LSH hyperplane). Same accumulation order as FloatDotProduct.
  */
case class FloatDotConst(child: Expression, consts: Array[Double]) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), consts.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * consts(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("graftPlane", consts, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $arr.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * $arr[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer dot product of two int-array columns accumulated in a long —
  * the scoring kernel of the scalar-quantized (int8-style) ANN path.
  * Integer sums are exact and associativity-free, so this one needs no
  * fold-order contract at all; any engine summing the same products
  * agrees bit-for-bit.
  */
case class IntDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getInt(i).toLong * y.getInt(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Whole LSH bit-signature in ONE expression: bit p of the result is set
  * iff dot(v, planes(p)) > 0, with the dot accumulating doubles in
  * ascending index order — identical per-plane arithmetic to
  * FloatDotConst, so results match the oracle's replay exactly. One
  * compact codegen loop replaces a 64-term chain of per-plane CASE
  * expressions (which grows the generated method past JIT limits and
  * falls out of whole-stage codegen).
  */
case class LshSignature(child: Expression, planes: Array[Array[Double]]) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val n = math.min(x.numElements(), pl.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getFloat(i).toDouble * pl(i); i += 1 }
      if (acc > 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("graftPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val pl = ctx.freshName("pl")
      s"""
         |long $sig = 0L;
         |for (int $p = 0; $p < $mat.length; $p++) {
         |  double[] $pl = $mat[$p];
         |  int $n = java.lang.Math.min($a.numElements(), $pl.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * $pl[$i];
         |  }
         |  if ($acc > 0.0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Argmax over a per-row candidate-vector array — the quantizer
  * assignment loop (IVF cell / PQ code) as ONE native expression: for
  * each row, iterate the broadcast candidate arrays in ascending
  * candidate order and keep the strictly-best score, so ties resolve to
  * the LOWEST candidate id — exactly the max(struct(score, -id)) rule
  * the join+groupBy formulation used, on identical doubles
  * (FloatDotProduct's left-fold accumulation, then score = dot /
  * (nrm·stat) in cosine mode or 2·dot − stat in PQ mode). Returns the
  * 0-based winning INDEX (-1 for an empty candidate array or null
  * input), which the caller maps back to cid/code via element_at — the
  * expression stays agnostic of the id type.
  *
  * Why an expression and not `aggregate(...)`: the HOF fold is
  * semantically identical but interpreted — per-element lambda binding
  * plus a struct allocation per step measured 2-4× slower on the
  * serving paths; this compiles to a primitive double loop inside
  * whole-stage codegen (doGenCode below; eval is the interpreted twin,
  * parity-pinned by ArgBestVectorSpec over random inputs).
  *
  * NaN rule: a NaN score (zero-norm embedding in cosine mode:
  * acc / (0 · cn)) normalizes to -Infinity, and a row whose scores are
  * ALL -Infinity falls back to candidate 0 — so every non-null input
  * row stays assigned to a cell/code (the old max(struct) formulation
  * ordered NaN greatest and kept such rows; silently dropping them
  * from posting lists / Lloyd means would be worse than either rule).
  * -1 is returned only for null inputs or an empty candidate array.
  */
case class ArgBestVector(
    vecs: Expression,
    stats: Expression,
    vec: Expression,
    nrm: Expression,
    cosine: Boolean
) extends Expression {
  override def children: Seq[Expression] = Seq(vecs, stats, vec, nrm)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vsA = vecs.eval(input)
    val stA = stats.eval(input)
    val vA = vec.eval(input)
    val nA = nrm.eval(input)
    if (vsA == null || stA == null || vA == null || nA == null) return -1
    val vs = vsA.asInstanceOf[ArrayData]
    val st = stA.asInstanceOf[ArrayData]
    val v = vA.asInstanceOf[ArrayData]
    val nv = nA.asInstanceOf[Double]
    var best = -1
    var bestScore = Double.NegativeInfinity
    var i = 0
    val m = vs.numElements()
    while (i < m) {
      val ce = vs.getArray(i)
      val n = math.min(v.numElements(), ce.numElements())
      var acc = 0.0
      var j = 0
      while (j < n) { acc += v.getFloat(j).toDouble * ce.getFloat(j).toDouble; j += 1 }
      var score = if (cosine) acc / (nv * st.getDouble(i)) else 2.0 * acc - st.getDouble(i)
      if (java.lang.Double.isNaN(score)) score = Double.NegativeInfinity
      if (score > bestScore) { bestScore = score; best = i }
      i += 1
    }
    if (best < 0 && m > 0) 0 else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode}
    val vsEv = vecs.genCode(ctx)
    val stEv = stats.genCode(ctx)
    val vEv = vec.genCode(ctx)
    val nEv = nrm.genCode(ctx)
    val best = ctx.freshName("best")
    val bestScore = ctx.freshName("bestScore")
    val m = ctx.freshName("m")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val ce = ctx.freshName("ce")
    val score = ctx.freshName("score")
    val scoreExpr =
      if (cosine) s"$acc / (${nEv.value} * ${stEv.value}.getDouble($i))"
      else s"2.0 * $acc - ${stEv.value}.getDouble($i)"
    val javaCode =
      code"""
         |${vsEv.code}
         |${stEv.code}
         |${vEv.code}
         |${nEv.code}
         |int $best = -1;
         |if (!(${vsEv.isNull} || ${stEv.isNull} || ${vEv.isNull} || ${nEv.isNull})) {
         |  double $bestScore = Double.NEGATIVE_INFINITY;
         |  int $m = ${vsEv.value}.numElements();
         |  for (int $i = 0; $i < $m; $i++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $ce = ${vsEv.value}.getArray($i);
         |    int $n = java.lang.Math.min(${vEv.value}.numElements(), $ce.numElements());
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $acc += ((double) ${vEv.value}.getFloat($j)) * ((double) $ce.getFloat($j));
         |    }
         |    double $score = $scoreExpr;
         |    if (java.lang.Double.isNaN($score)) $score = Double.NEGATIVE_INFINITY;
         |    if ($score > $bestScore) { $bestScore = $score; $best = $i; }
         |  }
         |  if ($best < 0 && $m > 0) $best = 0;
         |}
       """.stripMargin
    ev.copy(
      code = javaCode,
      isNull = FalseLiteral,
      value = JavaCode.variable(best, org.apache.spark.sql.types.IntegerType)
    )
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): Expression =
    copy(vecs = newChildren(0), stats = newChildren(1), vec = newChildren(2), nrm = newChildren(3))
}

object VectorExpressions {
  def fdot(a: Column, b: Column): Column =
    Bridge.column(FloatDotProduct(Bridge.expression(a), Bridge.expression(b)))
  def idot(a: Column, b: Column): Column =
    Bridge.column(IntDotProduct(Bridge.expression(a), Bridge.expression(b)))
  def fdotConst(a: Column, consts: Array[Double]): Column =
    Bridge.column(FloatDotConst(Bridge.expression(a), consts))
  def lshSig(a: Column, planes: Array[Array[Double]]): Column =
    Bridge.column(LshSignature(Bridge.expression(a), planes))

  /** 0-based index of argmax_i fdot(vec, vecs[i]) / (nrm · stats[i]). */
  def argBestCosine(vecs: Column, stats: Column, vec: Column, nrm: Column): Column =
    Bridge.column(
      ArgBestVector(
        Bridge.expression(vecs),
        Bridge.expression(stats),
        Bridge.expression(vec),
        Bridge.expression(nrm),
        cosine = true
      )
    )

  /** 0-based index of argmax_i 2·fdot(vec, vecs[i]) − stats[i]. */
  def argBestPq(vecs: Column, stats: Column, vec: Column): Column =
    Bridge.column(
      ArgBestVector(
        Bridge.expression(vecs),
        Bridge.expression(stats),
        Bridge.expression(vec),
        Bridge.expression(org.apache.spark.sql.functions.lit(0.0)),
        cosine = false
      )
    )
}
