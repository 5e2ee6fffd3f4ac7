package graft.engine

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.io.File
import java.nio.file.Files
import scala.io.Source

/** End-to-end job-descriptor parity with the reference's integration
  * suite: `runJob(inputDir, outputDir, mapper, reducer, M, R)` must
  * behave exactly like submitting the reference's job dict
  * (reference mapreduce/submit.py:59-78) — dir in, `part-NNNNN` files
  * out, merged contents equal to the published golden output.
  * Mirrors reference tests/test_integration_03.py:67-98 (M=4, R=2).
  */
class RunJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "run-job-spec")

  private def resource(path: String): String =
    getClass.getResource(s"/refcorpus/$path").getPath

  private def goldenLines(name: String): List[String] = {
    val src = Source.fromFile(resource(s"correct/$name"), "UTF-8")
    try src.getLines().toList
    finally src.close()
  }

  private def freshOutputDir(tag: String): String = {
    val base = Files.createTempDirectory(s"graft-$tag-").toFile
    base.deleteOnExit()
    new File(base, "output").getPath // must not pre-exist (Hadoop sink contract)
  }

  test("runJob: M=4 R=2 word count — exact part files, golden contents (test_integration_03)") {
    val outDir = freshOutputDir("runjob")
    MapReduce.runJob(
      spark,
      inputDir = resource("input"),
      outputDir = outDir,
      // wc_map.sh semantics: lowercase, split on space/tab, keep empties
      mapper = line => line.toLowerCase.split("[ \t]", -1).iterator.map(w => (w, "1")),
      // wc_reduce.sh semantics: uniq -c over adjacent sorted keys
      reducer = (word, ones) => Iterator.single(s"$word\t${ones.size}"),
      numMappers = 4,
      numReducers = 2
    )

    // reference :85 — the output dir holds EXACTLY the R part files
    // (os.listdir sees hidden files too, so crc/_SUCCESS must be gone)
    val listing = new File(outDir).list().toList.sorted
    assert(listing === List("part-00000", "part-00001"))

    // reference :87-98 — merged sorted part contents equal the golden file
    val merged = listing.flatMap { f =>
      val src = Source.fromFile(new File(outDir, f), "UTF-8")
      try src.getLines().toList
      finally src.close()
    }.sorted
    assert(merged === goldenLines("word_count_correct.txt").sorted)

    // each part is internally (key,value)-sorted and keys are md5-routed,
    // like a reference part file (tests/test_worker_07/08 invariants)
    listing.zipWithIndex.foreach { case (f, i) =>
      val src = Source.fromFile(new File(outDir, f), "UTF-8")
      val ls = try src.getLines().toList finally src.close()
      assert(ls === ls.sorted, s"$f not sorted")
      ls.foreach { l =>
        val key = l.substring(0, l.indexOf('\t'))
        assert(MapReduce.md5Partition(key, 2) === i, s"key '$key' in wrong part")
      }
    }
  }

  test("runExecJob: external executables dir-to-dir (submit.py executable descriptor)") {
    val outDir = freshOutputDir("execjob")
    MapReduce.runExecJob(
      spark,
      inputDir = resource("input"),
      outputDir = outDir,
      // the reference wc_map.sh / wc_reduce.sh pipelines, inlined
      mapperCmd = """tr '[A-Z]' '[a-z]' | awk '{ for (i = 1; i <= NF; i++) print $i"\t1" }'""",
      reducerCmd = """cut -f1 | uniq -c | awk '{print $2"\t"$1}'""",
      numMappers = 4,
      numReducers = 2
    )
    val listing = new File(outDir).list().toList.sorted
    assert(listing === List("part-00000", "part-00001"))
    val merged = listing.flatMap { f =>
      val src = Source.fromFile(new File(outDir, f), "UTF-8")
      try src.getLines().toList
      finally src.close()
    }.sorted
    // awk's NF-loop drops empty tokens; golden minus the empty-key line
    // (native-closure runJob above covers empty keys)
    assert(merged === goldenLines("word_count_correct.txt").filterNot(_.startsWith("\t")).sorted)
  }

  test("runExecJob: numMappers=0 keeps the scan's natural splits (same convention as runJob)") {
    val outDir = freshOutputDir("execjob0")
    MapReduce.runExecJob(
      spark,
      inputDir = resource("input"),
      outputDir = outDir,
      mapperCmd = """tr '[A-Z]' '[a-z]' | awk '{ for (i = 1; i <= NF; i++) print $i"\t1" }'""",
      reducerCmd = """cut -f1 | uniq -c | awk '{print $2"\t"$1}'""",
      numMappers = 0,
      numReducers = 2
    )
    val listing = new File(outDir).list().toList.sorted
    assert(listing === List("part-00000", "part-00001"))
    val merged = listing.flatMap { f =>
      val src = Source.fromFile(new File(outDir, f), "UTF-8")
      try src.getLines().toList
      finally src.close()
    }.sorted
    assert(merged === goldenLines("word_count_correct.txt").filterNot(_.startsWith("\t")).sorted)
  }
}
