package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL-string surface: the parquet tables registered as temp views
  * and flagship queries routed through `spark.sql(...)` — the way an
  * analyst reaches this engine. The statements are the SAME ANSI SQL
  * strings the DuckDB oracle executes (graft.oracle.Oracles), which is
  * the strongest portability statement available: one query text, two
  * engines, hash-identical results. Catalyst gives the parsed strings
  * the same physical treatment as the DataFrame builder twins —
  * pushdown, pruning, partial aggregation, TakeOrdered —
  * SqlSurfaceSpec pins row equality and node-for-node operator
  * skeletons against the builders.
  */
object SqlSurface {

  /** Registers every TESTDATA table as a session temp view (metadata
    * only — no scan happens here; each view is lazily planned like the
    * Tables readers, with events going through the same NTZ/nanos
    * normalization).
    */
  private[graft] def registerViews(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t))
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** Runs one SQL string against the registered views. */
  def sql(spark: SparkSession, dir: String, statement: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(statement)
  }
}
