package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Interpreted-vs-compiled parity for ArgBestVector (the quantizer
  * assignment loop): `eval` and the `doGenCode` projection must agree
  * on every input — random vectors, exact ties (lowest index wins),
  * empty candidate arrays (-1), null inputs (-1), and the NaN rule
  * (zero-norm vec in cosine mode → scores all NaN → fallback index 0,
  * the row stays assigned).
  */
class ArgBestVectorSpec extends AnyFunSuite {

  private val vecsT = ArrayType(ArrayType(FloatType))
  private val statsT = ArrayType(DoubleType)
  private val vecT = ArrayType(FloatType)

  private def expr(cosine: Boolean) = ArgBestVector(
    BoundReference(0, vecsT, nullable = true),
    BoundReference(1, statsT, nullable = true),
    BoundReference(2, vecT, nullable = true),
    BoundReference(3, DoubleType, nullable = true),
    cosine = cosine
  )

  private def row(
      vecs: Array[Array[Float]],
      stats: Array[Double],
      v: Array[Float],
      nrm: java.lang.Double
  ): InternalRow =
    InternalRow(
      if (vecs == null) null
      else new GenericArrayData(vecs.map(x => ArrayData.toArrayData(x): Any)),
      if (stats == null) null else ArrayData.toArrayData(stats),
      if (v == null) null else ArrayData.toArrayData(v),
      nrm
    )

  private def check(cosine: Boolean, r: InternalRow): Int = {
    val e = expr(cosine)
    val interpreted = e.eval(r).asInstanceOf[Int]
    val compiled = GenerateUnsafeProjection.generate(Seq(e)).apply(r).getInt(0)
    assert(
      interpreted === compiled,
      s"eval=$interpreted codegen=$compiled (cosine=$cosine, row=$r)"
    )
    interpreted
  }

  test("random inputs: eval == codegen in both score modes") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 200; cosine <- Seq(true, false)) {
      val dim = 1 + rng.nextInt(8)
      val m = rng.nextInt(6) // 0 candidates included
      val vecs = Array.fill(m)(Array.fill(dim)(rng.nextFloat() * 2 - 1))
      val stats = Array.fill(m)(0.1 + rng.nextDouble())
      val v = Array.fill(dim)(rng.nextFloat() * 2 - 1)
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum)
      check(cosine, row(vecs, stats, v, nrm))
    }
  }

  test("exact ties resolve to the lowest candidate index in both paths") {
    val c = Array(0.5f, 0.5f)
    val vecs = Array(c.clone(), c.clone(), c.clone())
    val stats = Array(1.0, 1.0, 1.0)
    val v = Array(1.0f, 0.0f)
    assert(check(cosine = true, row(vecs, stats, v, 1.0)) === 0)
    assert(check(cosine = false, row(vecs, stats, v, 0.0)) === 0)
  }

  test("empty candidate array returns -1 in both paths") {
    val v = Array(1.0f, 0.0f)
    assert(check(cosine = true, row(Array.empty, Array.empty[Double], v, 1.0)) === -1)
    assert(check(cosine = false, row(Array.empty, Array.empty[Double], v, 0.0)) === -1)
  }

  test("null inputs return -1 in both paths") {
    val vecs = Array(Array(1.0f, 0.0f))
    val stats = Array(1.0)
    val v = Array(1.0f, 0.0f)
    assert(check(cosine = true, row(null, stats, v, 1.0)) === -1)
    assert(check(cosine = true, row(vecs, null, v, 1.0)) === -1)
    assert(check(cosine = true, row(vecs, stats, null, 1.0)) === -1)
    assert(check(cosine = true, row(vecs, stats, v, null)) === -1)
  }

  test("all-NaN scores (zero-norm vec, cosine) keep the row assigned to index 0") {
    val vecs = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    val stats = Array(1.0, 1.0)
    val zero = Array(0.0f, 0.0f)
    // nrm = 0 → every score = 0/(0·cn) = NaN → fallback 0, NOT -1
    assert(check(cosine = true, row(vecs, stats, zero, 0.0)) === 0)
  }

  test("NaN in one candidate's score does not mask a finite best") {
    // cosine with stats(0) = 0 → score(0) = acc/0 = ±Inf or NaN; a
    // finite positive score on candidate 1 must still win when larger
    val vecs = Array(Array(1.0f, 0.0f), Array(1.0f, 0.0f))
    val stats = Array(0.0, 1.0) // candidate 0: acc/0 = +Inf (acc>0)
    val v = Array(1.0f, 0.0f)
    // +Inf beats the finite score — both paths must agree on index 0
    assert(check(cosine = true, row(vecs, stats, v, 1.0)) === 0)
    val vneg = Array(-1.0f, 0.0f)
    // acc<0 → candidate 0 scores -Inf, candidate 1 scores finite → 1
    assert(check(cosine = true, row(vecs, stats, vneg, 1.0)) === 1)
  }
}
