package graft.engine

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2a op #10 (manager job queue, FIFO) is delegated to Spark's
  * scheduler (reference tests/test_manager_01.py queues two jobs and
  * runs them in submission order). This spec demonstrates the delegated
  * contract: the scheduler pool is FIFO, and multiple engine jobs
  * submitted concurrently all complete with correct, independent
  * results through the one shared scheduler.
  */
class JobQueueSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "job-queue-spec")

  test("scheduler is FIFO and sequentially-submitted jobs run to correct results") {
    assert(spark.sparkContext.getConf.get("spark.scheduler.mode", "FIFO") === "FIFO")
    import spark.implicits._
    // two distinct jobs through the engine core, submitted back-to-back
    // (the reference's two-queued-jobs scenario)
    val wordJob = MapReduce.run(
      spark.createDataset(Seq("a b a", "b c")),
      mapper = line => line.split(" ").iterator.map(w => (w, "1")),
      reducer = (w, ones) => Iterator.single(s"$w\t${ones.size}"),
      numReducers = 2
    )
    val grepJob = MapReduce.run(
      spark.createDataset(Seq("keep this", "drop that", "keep too")),
      mapper = line => if (line.contains("keep")) Iterator.single(("1", line)) else Iterator.empty,
      reducer = (_, lines) => lines,
      numReducers = 1
    )
    assert(wordJob.collect().sorted.toSeq === Seq("a\t2", "b\t2", "c\t1"))
    assert(grepJob.collect().toSeq === Seq("keep this", "keep too"))
  }

  test("two queued jobs get isolated per-job output dirs, completed in submission order (test_manager_01)") {
    // the reference manager gives each queued job its own numbered
    // directory tree (tests/test_manager_01.py:25-28 waits for tmp/job-0)
    // and a later job never disturbs an earlier job's finished output
    import java.io.File
    import scala.io.Source
    def readAll(f: File): List[String] = {
      val src = Source.fromFile(f, "UTF-8")
      try src.getLines().toList
      finally src.close()
    }
    def golden(name: String): List[String] = {
      val src = Source.fromFile(getClass.getResource(s"/refcorpus/correct/$name").getPath, "UTF-8")
      try src.getLines().toList
      finally src.close()
    }
    val base = java.nio.file.Files.createTempDirectory("graft-jobqueue-").toFile
    val input = getClass.getResource("/refcorpus/input").getPath
    val out0 = new File(base, "job-0/output")
    val out1 = new File(base, "job-1/output")

    // job-0: word count
    MapReduce.runJob(
      spark,
      input,
      out0.getPath,
      mapper = line => line.toLowerCase.split("[ \t]", -1).iterator.map(w => (w, "1")),
      reducer = (word, ones) => Iterator.single(s"$word\t${ones.size}"),
      numMappers = 2,
      numReducers = 1
    )
    // job-0 finished (FIFO: it ran to completion) before job-1 existed
    assert(new File(out0, "part-00000").isFile)
    assert(!new File(base, "job-1").exists)
    val job0Snapshot = readAll(new File(out0, "part-00000"))
    assert(job0Snapshot.sorted === golden("word_count_correct.txt").sorted)

    // job-1: grep, own directory tree
    MapReduce.runJob(
      spark,
      input,
      out1.getPath,
      mapper = line =>
        if (line.trim.nonEmpty && line.toLowerCase.contains("product")) Iterator.single(("1", line))
        else Iterator.empty,
      reducer = (_, lines) => lines,
      numMappers = 2,
      numReducers = 1
    )
    assert(readAll(new File(out1, "part-00000")) === golden("grep_correct.txt"))
    // isolation: job-1 left job-0's output byte-identical
    assert(readAll(new File(out0, "part-00000")) === job0Snapshot)
    assert(out0.list().toList === List("part-00000"))
  }

  test("concurrently-submitted jobs share the FIFO scheduler and all complete correctly") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = (1 to 4).map { k =>
      Future {
        MapReduce
          .run(
            spark.createDataset((1 to 100).map(i => s"k$k v$i")),
            mapper = line => { val Array(a, b) = line.split(" "); Iterator.single((a, b)) },
            reducer = (key, vs) => Iterator.single(s"$key:${vs.size}"),
            numReducers = 2
          )
          .collect()
          .toSeq
      }
    }
    val results = Await.result(Future.sequence(futures), 120.seconds)
    results.zipWithIndex.foreach { case (r, i) => assert(r === Seq(s"k${i + 1}:100")) }
  }
}
