package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** Native expressions for tokenize/shingle hot paths. The declarative
  * `transform(sequence(...), concat_ws)` + `array_distinct` formulation
  * is interpreted per element (lambda machinery) and array_distinct is
  * O(n²) — ~12 s for 5k docs at sf0.1. These do one pass per ROW in
  * plain Java collections (~100× fewer virtual calls); CodegenFallback
  * is fine because cost-per-row dominates, not expression dispatch.
  *
  * Tokenization contract (must stay equal to the oracle's
  * regexp_split_to_array(lower(text), '[ \t]')): split on ' ' or '\t',
  * KEEP empty segments, input already lowercased by the caller.
  */
object TextSplit {
  def splitWs(text: String): ArrayBuffer[String] = {
    val parts = new ArrayBuffer[String](text.length / 5 + 1)
    var start = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == ' ' || c == '\t') { parts += text.substring(start, i); start = i + 1 }
      i += 1
    }
    parts += text.substring(start)
    parts
  }

  private[functions] def toArrayData(it: java.util.LinkedHashSet[String]): GenericArrayData = {
    val arr = new Array[Any](it.size)
    val iter = it.iterator()
    var i = 0
    while (iter.hasNext) { arr(i) = UTF8String.fromString(iter.next()); i += 1 }
    new GenericArrayData(arr)
  }
}

/** Distinct word w-shingles ("a b c") of a whitespace-tokenized string.
  * Equal (as a set) to the declarative form in Portable.shingles and the
  * DuckDB oracle's list_distinct(list_transform(...)).
  */
case class WordShingles(child: Expression, width: Int) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val toks = TextSplit.splitWs(v.asInstanceOf[UTF8String].toString)
    val seen = new java.util.LinkedHashSet[String]()
    if (toks.length >= width) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + width <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < width) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
    }
    TextSplit.toArrayData(seen)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct whitespace tokens of a string (simhash's token universe). */
case class DistinctTokens(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val toks = TextSplit.splitWs(v.asInstanceOf[UTF8String].toString)
    val seen = new java.util.LinkedHashSet[String]()
    toks.foreach(seen.add)
    TextSplit.toArrayData(seen)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling polynomial hash over the string's code points:
  * h ← (h·31 + codepoint) mod `mod`, seeded with `seed`. Pure 64-bit
  * integer arithmetic — exactly the DuckDB oracle's
  * list_reduce(list_prepend(seed, list_transform(..ord..)), ...) fold.
  */
case class RollingHash(child: Expression, seed: Long, mod: Long)
    extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var h = seed
    val it = s.codePoints().iterator()
    while (it.hasNext) h = (h * 31 + it.next()) % mod
    h
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunks: boundary after code-point position i
  * (k ≤ i < len) when the polynomial hash of the trailing k code points
  * is ≡ 0 mod `mask`; returns the chunk substrings. One O(len) sliding
  * Rabin-Karp pass — the declarative nested-HOF formulation
  * (aggregate-inside-filter) re-folds the window at every position,
  * O(len·k) with per-char String allocation: ~300 s over sf0.1 vs <1 s
  * here. Value-identical to the DuckDB oracle's per-position
  * list_reduce replay: H_{i+1} = (H_i − c_out·31^{k−1})·31 + c_in
  * (mod p) is the same polynomial, updated incrementally.
  */
case class CdcChunks(child: Expression, window: Int, mask: Long, mod: Long)
    extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val pow: Long = { // 31^(window-1) mod `mod`
    var r = 1L
    var i = 1
    while (i < window) { r = (r * 31) % mod; i += 1 }
    r
  }

  override def nullSafeEval(v: Any): Any = {
    val cps = v.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    val cuts = new ArrayBuffer[Int]()
    cuts += 0
    if (n >= window) {
      var h = 0L
      var i = 0
      while (i < window) { h = (h * 31 + cps(i)) % mod; i += 1 }
      // i is the count of consumed code points == 1-based window end
      if (h % mask == 0 && i < n) cuts += i
      while (i < n) {
        h = (((h - cps(i - window) * pow) % mod + mod) % mod * 31 + cps(i)) % mod
        i += 1
        if (h % mask == 0 && i < n) cuts += i
      }
    }
    cuts += n
    val out = new Array[Any](cuts.length - 1)
    var c = 0
    while (c < cuts.length - 1) {
      out(c) = UTF8String.fromString(new String(cps, cuts(c), cuts(c + 1) - cuts(c)))
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** −Σ p·log₂p char entropy of a string (pre-round6): one sorted-char
  * pass per row in plain Java, replacing the declarative
  * array_sort + higher-order run-fold (interpreted lambda machinery
  * with a struct allocation PER CHARACTER — measured 6.6 s at sf1
  * against this expression's sub-second pass). Term order and IEEE
  * sequence are IDENTICAL to the declarative form and the DuckDB
  * oracle: runs close in ascending char order, each term is
  * (run/n)·(ln(p)/ln 2), accumulated left-to-right from 0.0 — so the
  * double agrees to the last ULP.
  */
case class CharEntropyBits(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n == 0) return 0.0d
    val chars = s.toCharArray
    java.util.Arrays.sort(chars)
    val nd = n.toDouble
    val ln2 = Math.log(2.0)
    var acc = 0.0d
    var runStart = 0
    var i = 1
    while (i <= n) {
      if (i == n || chars(i) != chars(runStart)) {
        val p = (i - runStart) / nd
        acc += p * (Math.log(p) / ln2)
        runStart = i
      }
      i += 1
    }
    -acc
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document term statistics for a FIXED query vocabulary:
  * [dl, tf(term1), …, tf(termQ)] in one pass over the string — the
  * BM25 scoring inputs. Replaces Q interpreted `filter(w, _ === t)`
  * higher-order scans over a materialized token array (lambda
  * machinery per element, array allocation per row). Tokenization
  * contract is TextSplit.splitWs's: split on ' '/'\t', KEEP empty
  * segments (so dl = separators + 1), input lowered by the caller —
  * byte-equal to the declarative split+filter form and the oracle's
  * regexp_split_to_array + list_filter replay.
  */
case class TermStats(child: Expression, terms: Seq[String])
    extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val out = new Array[Long](terms.length + 1)
    val n = s.length
    var start = 0
    var i = 0
    def seg(endExcl: Int): Unit = {
      out(0) += 1
      var t = 0
      while (t < terms.length) {
        val term = terms(t)
        if (endExcl - start == term.length) {
          var j = 0
          var ok = true
          while (ok && j < term.length) {
            if (s.charAt(start + j) != term.charAt(j)) ok = false
            j += 1
          }
          if (ok) out(t + 1) += 1
        }
        t += 1
      }
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t') { seg(i); start = i + 1 }
      i += 1
    }
    seg(n)
    new GenericArrayData(out.map(Long.box).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct char count of a string — the companion statistic of
  * [[CharEntropyBits]], same single sorted pass instead of
  * size(array_distinct(split(...))).
  */
case class DistinctChars(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return 0
    val chars = s.toCharArray
    java.util.Arrays.sort(chars)
    var d = 1
    var i = 1
    while (i < chars.length) {
      if (chars(i) != chars(i - 1)) d += 1
      i += 1
    }
    d
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  def wordShingles(loweredText: Column, width: Int = 3): Column =
    Bridge.column(WordShingles(Bridge.expression(loweredText), width))
  def charEntropyBits(text: Column): Column =
    Bridge.column(CharEntropyBits(Bridge.expression(text)))
  def distinctChars(text: Column): Column =
    Bridge.column(DistinctChars(Bridge.expression(text)))
  def distinctTokens(loweredText: Column): Column =
    Bridge.column(DistinctTokens(Bridge.expression(loweredText)))
  def rollingHash(text: Column, seed: Long, mod: Long): Column =
    Bridge.column(RollingHash(Bridge.expression(text), seed, mod))
  def cdcChunks(text: Column, window: Int, mask: Long, mod: Long): Column =
    Bridge.column(CdcChunks(Bridge.expression(text), window, mask, mod))
  def termStats(loweredText: Column, terms: Seq[String]): Column =
    Bridge.column(TermStats(Bridge.expression(loweredText), terms))
}
