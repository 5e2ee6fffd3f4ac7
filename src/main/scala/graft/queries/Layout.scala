package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`. Interleaving
  * the bits of two filter columns and range-partitioning + sorting on
  * the interleaved key makes every output file cover a small RECTANGLE
  * of the (partkey, suppkey) space instead of a stripe, so a
  * conjunctive box predicate can skip most files from their footer
  * min/max stats alone — the dominant cost lever for selective scans
  * over 100 TB: I/O avoided at the file/row-group level, before any
  * row is read. The layout is a build-once warehouse artifact (same
  * fingerprint + retirement pattern as the q22 bucket tables); queries
  * against it return byte-identical results to the unclustered table,
  * which is exactly what the oracle checks.
  */
object Layout {

  /** Morton bit-spread of a 16-bit value into even bit positions — the
    * classic shift/mask cascade, composed from codegen'd bitwise
    * functions (no UDF). Inputs are masked to 16 bits first: at test
    * scale the keys fit; a production run quantile-buckets each
    * dimension to 2^16 ranks first (documented, not needed here).
    */
  private[queries] def spreadBits(c: Column): Column = {
    val m = c.bitwiseAND(lit(0xffff))
    val s1 = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00ff00ff))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0f0f0f0f))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555))
  }

  /** 32-bit Morton key: x in even bits, y in odd bits. */
  private[queries] def zValue(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** Output files in the clustered layout. 32 = one per local core; at
    * cluster scale this is files-per-job sized to ~1 GB each.
    */
  val ZFiles = 32

  // the box predicate the registered query runs — narrow in both
  // dimensions, so a 1-D sort on either key alone could not prune well
  val PartLo = 64; val PartHi = 192; val SuppLo = 8; val SuppHi = 24

  /** Builds (once per content fingerprint) the z-ordered lineitem
    * table: range-partitioned and sorted by the Morton key of
    * (l_partkey, l_suppkey), so file boundaries follow the space-
    * filling curve.
    */
  private[queries] def zorderTable(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val fp = Relational.sourceFingerprint(spark, s"$dir/lineitem.parquet")
    val t = s"graft_zorder_$fp"
    Relational.buildOnce(spark, Seq("graft_zorder_"), Seq(t)) {
      Tables
        .lineitem(spark, dir)
        .withColumn("z", zValue($"l_partkey".cast("int"), $"l_suppkey".cast("int")))
        .repartitionByRange(ZFiles, $"z")
        .sortWithinPartitions($"z")
        .drop("z")
        .write
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(t)
    }
    t
  }

  /** The registered query: a selective conjunctive box scan over the
    * z-ordered layout. Results are layout-invariant (the oracle runs
    * the same predicate on the raw table); the layout's value — most
    * files provably skippable from footer stats — is pinned by
    * LayoutSpec against the natural (insertion-order) layout where
    * almost none are.
    */
  def zorderScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark
      .table(zorderTable(spark, dir))
      .filter($"l_partkey".between(PartLo, PartHi) && $"l_suppkey".between(SuppLo, SuppHi))
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        sum($"l_quantity").cast("long").as("sum_qty"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("revenue")
      )
      .orderBy($"l_returnflag")
  }
}
