package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the registry↔oracle contract the driver's correctness gate
  * assumes: every registered query must carry a DuckDB oracle, except
  * the two documented rows-only entries — and any FUTURE rows-only
  * addition must edit the whitelist here, visibly. Verify and Bench
  * both iterate `SparkEntry.queries` directly, so registry==driven-set
  * holds by construction; this spec closes the remaining leg
  * (registry==oracled-set).
  */
class RegistrySyncSpec extends AnyFunSuite {

  /** Rows-only by documented design:
    * - q21_approx_sketches: approximate sketch values have no exact SQL
    *   oracle; its exact companion q21_sketch_gate is fully oracled.
    * - text_stratified_sample: seeded-sample membership is engine-RNG-
    *   specific; its deterministic twin text_stratified_topk is fully
    *   oracled.
    */
  private val rowsOnlyWhitelist = Set("q21_approx_sketches", "text_stratified_sample")

  test("every registered query is oracled or whitelisted rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnlyWhitelist
    assert(
      missing.isEmpty,
      s"queries with no oracle and not whitelisted: ${missing.toSeq.sorted.mkString(", ")}"
    )
  }

  test("every oracle belongs to a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(
      orphans.isEmpty,
      s"oracles with no registered query: ${orphans.toSeq.sorted.mkString(", ")}"
    )
  }

  test("the rows-only whitelist names registered, un-oracled queries") {
    assert((rowsOnlyWhitelist -- SparkEntry.queries.keySet).isEmpty, "whitelist names a missing query")
    assert(
      rowsOnlyWhitelist.intersect(SparkEntry.oracleSql.keySet).isEmpty,
      "a whitelisted rows-only query now has an oracle — remove it from the whitelist"
    )
  }

  test("registry names are unique and non-empty") {
    assert(SparkEntry.queries.keySet.forall(_.nonEmpty))
    // Map keys are unique by construction; pin the expected floor so an
    // accidental mass-deregistration (e.g. a bad merge) fails loudly
    assert(SparkEntry.queries.size >= 200, s"registry shrank to ${SparkEntry.queries.size}")
  }
}
