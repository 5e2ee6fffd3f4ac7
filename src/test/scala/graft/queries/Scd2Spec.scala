package graft.queries

import graft.{GraftSession, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SCD2 contract (interval chaining, one open row per user,
  * no same-type adjacent versions, single exchange) and the salted
  * join's two claims: result-invariance vs the plain join and the
  * salt actually reaching the physical join keys.
  */
class Scd2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "scd2-salt")
  private val dir = "/root/testdata/sf0.001"

  test("SCD2 intervals chain per user with exactly one open current row") {
    val rows = Events.scd2(spark, dir).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_.getLong(1))
      // versions are 1..k contiguous
      assert(sorted.map(_.getLong(1)).toSeq === (1L to vs.length.toLong), s"user $u")
      // exactly one open (is_current) row, and it is the last version
      assert(vs.count(_.getBoolean(5)) === 1, s"user $u")
      assert(sorted.last.getBoolean(5), s"user $u")
      // valid_to of version k == valid_from of version k+1
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(4) === b.getTimestamp(3), s"user $u gap")
          // a change point never repeats the previous type
          assert(a.getString(2) !== b.getString(2), s"user $u run-merge")
        case _ => ()
      }
    }
    // version-1 rows == distinct users in the log
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(rows.count(_.getLong(1) == 1L).toLong === users)
  }

  test("SCD2 plans a single user-keyed exchange for both window passes") {
    val plan = Events
      .scd2(spark, dir)
      .queryExecution
      .executedPlan
      .toString
    // one hashpartitioning exchange on user_id (plus the final sort's
    // range exchange) — the second Window must NOT re-shuffle
    val hashExchanges =
      "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges === 1, plan.linesIterator.take(40).mkString("\n"))
  }

  test("salted join equals the plain join and salts the physical join keys") {
    import spark.implicits._
    val got = Relational.q32SaltedJoin(spark, dir).collect().map(_.toSeq).toSeq
    val want = Tables
      .lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("revenue")
      )
      .orderBy($"o_orderpriority")
      .collect()
      .map(_.toSeq)
      .toSeq
    assert(got === want)
    val plan = Relational
      .q32SaltedJoin(spark, dir)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("SortMergeJoin"), "salting demo must exercise the shuffle join path")
    assert(!plan.contains("BroadcastHashJoin"), "broadcast would bypass the salted shuffle")
    assert(
      "SortMergeJoin \\[[^\\]]*salt".r.findFirstIn(plan).isDefined,
      "salt must be part of the physical join keys"
    )
  }
}
