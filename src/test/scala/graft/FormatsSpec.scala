package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Source/sink format coverage: the engine reads and writes parquet, ORC,
  * CSV, and JSON with value fidelity (the reference only speaks text —
  * formats come free with the Spark-native design, SURVEY §1).
  */
class FormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "formats-spec")
  private val dir = "/root/testdata/sf0.001"

  private def roundTrip(fmt: String): Unit = {
    import spark.implicits._
    val out = Files.createTempDirectory(s"graft-$fmt").toString + "/t"
    val src = Tables.orders(spark, dir)
    src.write.format(fmt).mode("overwrite").option("header", "true").save(out)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true").option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .load(out)
    assert(back.count() === src.count(), s"$fmt row count")
    val a = src.agg(round(sum($"o_totalprice"), 2)).head().getDouble(0)
    val b = back.agg(round(sum(col("o_totalprice").cast("double")), 2)).head().getDouble(0)
    assert(a === b, s"$fmt totalprice sum")
  }

  test("parquet round-trip")(roundTrip("parquet"))
  test("orc round-trip")(roundTrip("orc"))
  test("csv round-trip")(roundTrip("csv"))
  test("json round-trip")(roundTrip("json"))
}
