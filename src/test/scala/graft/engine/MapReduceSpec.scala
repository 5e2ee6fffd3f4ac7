package graft.engine

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source
import scala.util.Random

/** Pins the reference's MapReduce semantics (FIXTURES.md §A invariants)
  * against the reference's own corpus: word-count and grep golden
  * outputs, the md5 partition function's documented key grouping, and
  * partition/sort invariants.
  */
class MapReduceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "mapreduce-spec")

  private def resource(path: String): String =
    getClass.getResource(s"/refcorpus/$path").getPath

  private def inputLines: Seq[String] = {
    (1 to 8).flatMap { i =>
      val src = Source.fromFile(resource(f"input/file$i%02d"), "UTF-8")
      try src.getLines().toList
      finally src.close()
    }
  }

  test("md5Partition groups keys exactly like the reference (test_worker_08)") {
    // reference tests/test_worker_08.py:196-223: with R=2, part 0 holds
    // {hello, bye, ""} and part 1 holds {goodbye, hadoop, world}
    for (k <- Seq("hello", "bye", "")) assert(MapReduce.md5Partition(k, 2) === 0, k)
    for (k <- Seq("goodbye", "hadoop", "world")) assert(MapReduce.md5Partition(k, 2) === 1, k)
  }

  test("md5Partition is total and stable (seeded property sweep)") {
    val rnd = new Random(42)
    (1 to 500).foreach { _ =>
      val k = rnd.alphanumeric.take(rnd.nextInt(20)).mkString + (if (rnd.nextBoolean()) "é中" else "")
      val r = 1 + rnd.nextInt(64)
      val p = MapReduce.md5Partition(k, r)
      assert(p >= 0 && p < r)
      assert(p === MapReduce.md5Partition(k, r))
    }
  }

  test("engine word count matches the reference golden output (test_integration_02)") {
    import spark.implicits._
    val input = spark.createDataset(inputLines)
    val got = MapReduce
      .run(
        input,
        // wc_map.sh semantics: lowercase, split on space/tab, keep empties
        mapper = line => line.toLowerCase.split("[ \t]", -1).iterator.map(w => (w, "1")),
        // wc_reduce.sh semantics: uniq -c over adjacent sorted keys
        reducer = (word, ones) => Iterator.single(s"$word\t${ones.size}"),
        numReducers = 2
      )
      .collect()
      .sorted
    val golden = {
      val src = Source.fromFile(resource("correct/word_count_correct.txt"), "UTF-8")
      try src.getLines().toList.sorted
      finally src.close()
    }
    assert(got.toList === golden)
  }

  test("engine grep matches the reference golden output byte-for-byte (test_integration_01)") {
    import spark.implicits._
    val input = spark.createDataset(inputLines)
    val got = MapReduce
      .run(
        input,
        // grep_map.py semantics: emit 1\tline when lowercased line contains
        // "product" and is non-blank
        mapper = line =>
          if (line.trim.nonEmpty && line.toLowerCase.contains("product")) Iterator.single(("1", line))
          else Iterator.empty,
        // grep_reduce.py semantics: drop the key
        reducer = (_, lines) => lines,
        numReducers = 1
      )
      .collect()
      .toList
    val golden = {
      val src = Source.fromFile(resource("correct/grep_correct.txt"), "UTF-8")
      try src.getLines().toList
      finally src.close()
    }
    // single reducer + all keys "1" ⇒ output globally sorted, byte-equal
    assert(got === golden)
  }

  test("equal keys land in one partition; partitions are (key,value)-sorted (test_worker_07/08)") {
    val rnd = new Random(7)
    val keys = Seq("a", "b", "", "k1", "k2", "möö")
    val kvs = List.fill(500)((keys(rnd.nextInt(keys.size)), rnd.alphanumeric.take(6).mkString))
    val r = 3
    val parts = spark.sparkContext
      .parallelize(kvs.map(kv => (kv, ())), 4)
      .repartitionAndSortWithinPartitions(new MapReduce.Md5KeyPartitioner(r))
      .mapPartitionsWithIndex { case (i, it) => it.map { case ((k, v), _) => (i, k, v) } }
      .collect()
    // every key appears in exactly the partition md5Partition assigns
    parts.foreach { case (p, k, _) => assert(p === MapReduce.md5Partition(k, r)) }
    // within each partition, rows are sorted by (key, value)
    parts.groupBy(_._1).values.foreach { rows =>
      val kv = rows.map(t => (t._2, t._3)).toSeq
      assert(kv === kv.sorted)
    }
  }

  test("reducer sees each key's values contiguously and streams groups lazily") {
    import spark.implicits._
    val input = spark.createDataset((1 to 1000).map(i => s"k${i % 7} v$i"))
    val out = MapReduce
      .run(
        input,
        mapper = line => { val Array(k, v) = line.split(" "); Iterator.single((k, v)) },
        reducer = (k, vs) => Iterator.single(s"$k:${vs.size}"),
        numReducers = 4
      )
      .collect()
      .sorted
    val expected = (0 until 7).map(i => s"k$i:${(1 to 1000).count(_ % 7 == i)}").sorted
    assert(out.toList === expected.toList)
  }

  test("pipe parity: external executables via RDD.pipe (Hadoop-Streaming analog)") {
    import spark.implicits._
    val input = spark.createDataset(inputLines)
    val got = Pipe
      .pipeJob(
        spark,
        input,
        // the reference wc_map.sh pipeline, inlined
        mapperCmd = """tr '[A-Z]' '[a-z]' | awk '{ for (i = 1; i <= NF; i++) print $i"\t1" }'""",
        reducerCmd = """cut -f1 | uniq -c | awk '{print $2"\t"$1}'""",
        numMappers = 2,
        numReducers = 2
      )
      .collect()
      .sorted
    // awk's NF-loop drops empty tokens, so compare against golden minus the
    // empty-key line (the native engine test covers empty keys)
    val golden = {
      val src = Source.fromFile(resource("correct/word_count_correct.txt"), "UTF-8")
      try src.getLines().toList.filterNot(_.startsWith("\t")).sorted
      finally src.close()
    }
    assert(got.toList === golden)
  }
}
