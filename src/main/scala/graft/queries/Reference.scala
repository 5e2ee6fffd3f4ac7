package graft.queries

import graft.Tables
import graft.engine.MapReduce
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's two shipped workloads (SURVEY.md §2b), with its exact
  * text semantics, over the `documents` table (each document's `text` is
  * the analog of one input line of the reference corpus).
  */
object Reference {

  /** Tokenize exactly like the reference word-count mapper
    * (tests/testdata/exec/wc_map.sh: `tr '[A-Z]' '[a-z]'` + awk split on
    * space/tab): lowercase, split on `[ \t]`, KEEP empty tokens (the
    * golden output counts the empty-string key — word_count_correct.txt
    * line 1 is `\t9`).
    */
  def tokens(c: Column): Column = split(lower(c), "[ \t]", -1)

  /** Word count, idiomatic Spark: scan → explode → hash-agg → sort.
    * Catalyst plans the same two-stage shape as the reference's fixed DAG
    * (map side: scan+explode+partial agg; shuffle on word; reduce side:
    * final agg), but with map-side combine the reference lacks — at
    * 100 TB the shuffle carries one row per distinct word per partition,
    * not one row per token occurrence.
    */
  def wordcount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(explode(tokens($"text")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"word")
  }

  /** Word count through the generalized MapReduce engine core — proves
    * the reference's full map→md5-partition→merge-sort→streaming-reduce
    * pipeline end-to-end (same oracle as `wordcount`). The reducer
    * mirrors wc_reduce.sh's `uniq -c` over adjacent sorted keys.
    */
  def mrWordcount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // per-row Scala lambda mapper chain → fanned scan so the map stage
    // parallelizes on sub-cores-split test files (no-op at scale)
    val lines = Tables.documentsFanned(spark, dir).select(lower($"text")).as[String]
    MapReduce
      .runKV(
        lines,
        mapper = line => line.split("[ \t]", -1).iterator.map(w => (w, "1")),
        reducer = (word, ones) => Iterator.single((word, ones.size.toString)),
        numReducers = 8
      )
      .toDF("word", "cnt_str")
      .select($"word", $"cnt_str".cast("long").as("cnt"))
      .orderBy($"word")
  }

  /** Grep per tests/testdata/exec/grep_map.py: emit lines whose lowercase
    * form contains the query (default "product", grep_map.py:14-17), skip
    * blank lines; reference output is globally sorted because every key is
    * "1" and reduce merge-sorts whole lines (grep_correct.txt is
    * byte-compared in test_integration_01.py:80-85).
    */
  def grep(spark: SparkSession, dir: String, query: String = "product"): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .filter(length(trim($"text")) > 0 && lower($"text").contains(query.toLowerCase))
      .select($"text")
      .orderBy($"text")
  }
}
