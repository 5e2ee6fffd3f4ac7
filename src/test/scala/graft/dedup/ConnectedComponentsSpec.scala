package graft.dedup

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the large-star/small-star connected components:
  * on random multigraphs the label fixpoint must equal a reference
  * union-find's component minima exactly (the CC contract is
  * algorithm-independent, so any divergence is a bug in the distributed
  * formulation — wrong star emission, a bad convergence test, etc).
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "cc-spec")

  private def referenceLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else {
        val r = find(p)
        parent(x) = r
        r
      }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
  }

  test("large-star/small-star labels equal union-find minima on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val m = 60 + trial * 30 // edges; node ids in [0, 200) → many components
      val edges = Seq
        .fill(m)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter(e => e._1 != e._2)
      val (labelsDf, rounds) = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      val got = labelsDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = referenceLabels(edges)
      // engine output lists non-minimum nodes; component minima label
      // themselves implicitly (absent row = own id)
      assert(got.keySet.subsetOf(want.keySet), s"unexpected nodes (trial $trial)")
      want.foreach { case (node, lbl) =>
        assert(got.getOrElse(node, node) == lbl, s"node $node (trial $trial, rounds $rounds)")
      }
    }
  }

  test("probe hook fires once per round with consistent edge telemetry") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)).filter(e => e._1 != e._2)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Dedup.CcRound]
    val (_, rounds) = Dedup.connectedComponents(edges.toDF("id_a", "id_b"), seen += _)
    assert(seen.size == rounds, "one probe callback per round")
    assert(seen.map(_.round) == (1 to rounds), "rounds numbered consecutively")
    // each round's input count is the previous round's output count
    seen.sliding(2).foreach {
      case scala.collection.mutable.ArrayBuffer(a, b) => assert(b.edgesIn == a.edgesOut)
      case _                                          =>
    }
    val last = seen.last
    assert(last.edgesIn == last.edgesOut, "fixpoint round leaves the edge set unchanged")
    assert(seen.forall(r => r.starSec >= 0 && r.checkSec >= 0 && r.parts >= 1))
    // the default overload (no probe) must behave identically
    val (labels2, rounds2) = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
    assert(rounds2 == rounds)
    assert(labels2.count() == last.edgesOut)
  }
}
