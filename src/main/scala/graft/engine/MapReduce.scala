package graft.engine

import org.apache.spark.Partitioner
import org.apache.spark.sql.{Dataset, SparkSession}

/** The reference engine's capability core, re-expressed Spark-first.
  *
  * The reference (EECS 485 P4) runs every job through one fixed DAG:
  * flatMap a mapper executable over text lines, hash-partition its
  * `key\tvalue` output on `int(md5(key),16) % R` (pinned by
  * reference tests/test_worker_08.py:196-242), merge-sort each reduce
  * partition lexicographically by the whole `key\tvalue` line (pinned by
  * tests/test_worker_07.py:117-124 — fixture inputs are unsorted, output
  * is asserted sorted), then stream the sorted lines through a reducer
  * that relies on equal keys being adjacent (tests/testdata/exec/
  * wc_reduce.sh uses `uniq -c`).
  *
  * Here: `flatMap` → `repartitionAndSortWithinPartitions` with an
  * md5-mod-R partitioner and (key,value) lexicographic ordering → a
  * streaming adjacent-key group iterator → reducer. Each phase is
  * distributed and never materializes a partition in memory (iterator
  * chain end-to-end), mirroring the reference's <1 MiB streaming bound
  * (tests/test_worker_11.py:119-122) and scaling to arbitrarily large
  * partitions (Spark's sort spills to disk).
  */
object MapReduce {

  /** Reference partition function: `int(md5(utf8(key)),16) % R`
    * (reference tests/test_worker_08.py — {"",hello,bye} → 0 and
    * {world,goodbye,hadoop} → 1 when R=2).
    */
  def md5Partition(key: String, numPartitions: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(key.getBytes("UTF-8"))
    new java.math.BigInteger(1, d).mod(java.math.BigInteger.valueOf(numPartitions.toLong)).intValue
  }

  /** Partitions composite (key,value) records by md5(key) % R, so records
    * with equal keys co-locate while the shuffle ordering can still sort
    * by the full (key,value) line.
    */
  final class Md5KeyPartitioner(override val numPartitions: Int) extends Partitioner {
    override def getPartition(key: Any): Int = key match {
      case (k: String, _) => md5Partition(k, numPartitions)
      case k: String      => md5Partition(k, numPartitions)
      case other          => md5Partition(String.valueOf(other), numPartitions)
    }
  }

  /** Lazily groups a (key,value)-sorted iterator into (key, values)
    * streams without materializing a group. The values iterator of group
    * i must be consumed (or abandoned) before group i+1 is requested —
    * same contract as Hadoop's reduce iterator; we drain any unconsumed
    * remainder defensively.
    */
  private final class AdjacentGroups(it: Iterator[(String, String)])
      extends Iterator[(String, Iterator[String])] {
    private val buf = it.buffered
    private var current: ValuesIter = _

    private final class ValuesIter(key: String) extends Iterator[String] {
      override def hasNext: Boolean = buf.hasNext && buf.head._1 == key
      override def next(): String = {
        if (!hasNext) throw new NoSuchElementException
        buf.next()._2
      }
      def drain(): Unit = while (hasNext) next()
    }

    override def hasNext: Boolean = {
      if (current != null) { current.drain(); current = null }
      buf.hasNext
    }
    override def next(): (String, Iterator[String]) = {
      if (!hasNext) throw new NoSuchElementException
      val key = buf.head._1
      current = new ValuesIter(key)
      (key, current)
    }
  }

  /** Runs a full map→shuffle→sort→reduce job with the reference's exact
    * semantics. `mapper` may emit 0..n pairs per line (it is a flatMap —
    * reference mappers are generators); `reducer` sees each key's values
    * as one contiguous sorted stream and may emit any number of output
    * lines. Output Dataset has `numReducers` partitions, each internally
    * sorted by (key, value) exactly like a reference `part-NNNNN` file.
    */
  def run(
      input: Dataset[String],
      mapper: String => IterableOnce[(String, String)],
      reducer: (String, Iterator[String]) => IterableOnce[String],
      numReducers: Int
  ): Dataset[String] = {
    val spark = input.sparkSession
    import spark.implicits._
    val mapped = input.rdd.flatMap(line => mapper(line).iterator.map(kv => (kv, ())))
    val sorted = mapped.repartitionAndSortWithinPartitions(new Md5KeyPartitioner(numReducers))
    val reduced = sorted.mapPartitions { part =>
      new AdjacentGroups(part.map(_._1)).flatMap { case (k, vs) => reducer(k, vs).iterator }
    }
    spark.createDataset(reduced)
  }

  /** Reference-style final sink (SURVEY.md §2a op #9): writes the job
    * output as exactly `part-00000 … part-0000(R-1)` text files in
    * `outputDir` — byte-compatible with the reference's layout
    * (reference tests/test_worker_07.py:106-114 pins the names,
    * test_integration_03.py:85 the file count). `run`'s output already
    * has R internally-sorted partitions, and the RDD text sink names
    * parts `part-NNNNN` natively.
    */
  def saveTextParts(output: Dataset[String], outputDir: String): Unit =
    output.rdd.saveAsTextFile(outputDir)

  /** Job-descriptor entry point — the reference's single user-facing API
    * (reference mapreduce/submit.py:59-78: a job is `{input_directory,
    * output_directory, mapper_executable, reducer_executable, num_mappers,
    * num_reducers}`). Reads the text directory, runs the map→shuffle→
    * sort→reduce pipeline with `numMappers` map tasks, and leaves EXACTLY
    * `numReducers` files named `part-00000 … part-0000(R-1)` in
    * `outputDir` (reference tests/test_integration_03.py:85 pins the
    * exact file count; :67-75 the descriptor shape).
    *
    * `numMappers` mirrors the reference's fixed M map tasks: the input is
    * repartitioned to M splits when the scan planned a different count.
    * At scale, pass the scan's natural split count (or 0 = "let Spark
    * plan") to skip that exchange — the reference's round-robin
    * file-to-mapper assignment is what Spark split planning already does.
    */
  def runJob(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      mapper: String => IterableOnce[(String, String)],
      reducer: (String, Iterator[String]) => IterableOnce[String],
      numMappers: Int,
      numReducers: Int
  ): Unit = {
    val lines = spark.read.textFile(inputDir)
    val split =
      if (numMappers > 0 && lines.rdd.getNumPartitions != numMappers) lines.repartition(numMappers)
      else lines
    saveTextParts(run(split, mapper, reducer, numReducers), outputDir)
    keepOnlyParts(spark, outputDir)
  }

  /** `runJob` with *external executables* as mapper/reducer — the literal
    * reference descriptor (`mapper_executable`/`reducer_executable` are
    * paths to programs speaking the stdin/stdout text protocol, e.g.
    * reference tests/testdata/exec/wc_map.sh).
    */
  def runExecJob(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      mapperCmd: String,
      reducerCmd: String,
      numMappers: Int,
      numReducers: Int
  ): Unit = {
    val out =
      Pipe.pipeJob(spark, spark.read.textFile(inputDir), mapperCmd, reducerCmd, numMappers, numReducers)
    saveTextParts(out, outputDir)
    keepOnlyParts(spark, outputDir)
  }

  /** Leaves only `part-NNNNN` files in `dir`: drops the committer's
    * `_SUCCESS` marker and (on checksummed local filesystems) the hidden
    * `.part-NNNNN.crc` siblings, so the directory listing is
    * byte-compatible with the reference layout. Uses the RAW filesystem —
    * `ChecksumFileSystem.listStatus` hides the very .crc files we need to
    * remove.
    */
  private def keepOnlyParts(spark: SparkSession, dir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case f                                          => f
    }
    fs.listStatus(path).foreach { st =>
      if (!st.getPath.getName.matches("part-\\d{5}")) fs.delete(st.getPath, false)
    }
  }

  /** Same pipeline but returning typed (key, value) rows — convenient
    * when the reducer output is itself `key\tvalue` shaped and the caller
    * wants a DataFrame for SQL-surface verification.
    */
  def runKV(
      input: Dataset[String],
      mapper: String => IterableOnce[(String, String)],
      reducer: (String, Iterator[String]) => IterableOnce[(String, String)],
      numReducers: Int
  ): Dataset[(String, String)] = {
    val spark = input.sparkSession
    import spark.implicits._
    val mapped = input.rdd.flatMap(line => mapper(line).iterator.map(kv => (kv, ())))
    val sorted = mapped.repartitionAndSortWithinPartitions(new Md5KeyPartitioner(numReducers))
    val reduced = sorted.mapPartitions { part =>
      new AdjacentGroups(part.map(_._1)).flatMap { case (k, vs) => reducer(k, vs).iterator }
    }
    spark.createDataset(reduced)
  }
}
