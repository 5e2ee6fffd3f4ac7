package graft.text

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form pins for the BPE surface: greedy merge-pass semantics
  * (non-overlapping, left-to-right), the deterministic argmax tie-break
  * (count desc, pair-lex asc), full train/encode round-trip on a
  * hand-computed corpus, and pairStats agreement with manual counting.
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "bpe")

  private def applyMerge(w: String, a: String, b: String): Seq[String] = {
    import spark.implicits._
    Seq(w)
      .toDF("w")
      .select(Bpe.mergePass(Bpe.symbols($"w"), a, b).as("s"))
      .collect()
      .head
      .getSeq[String](0)
  }

  test("merge pass is greedy left-to-right and non-overlapping") {
    assert(applyMerge("aaa", "a", "a") === Seq("aa", "a"))
    assert(applyMerge("aaaa", "a", "a") === Seq("aa", "aa"))
    assert(applyMerge("aaaaa", "a", "a") === Seq("aa", "aa", "a"))
    assert(applyMerge("abab", "a", "b") === Seq("ab", "ab"))
    assert(applyMerge("ba", "a", "b") === Seq("b", "a"))
    assert(applyMerge("x", "a", "b") === Seq("x"))
  }

  test("train learns the hand-computed merge sequence, encode replays it") {
    import spark.implicits._
    // corpus: "aaab" + "aab". round 1: aa=3, ab=2 → merge (a,a).
    // round 2: [aa,a,b] + [aa,b] → (aa,a)=1, (a,b)=1, (aa,b)=1 →
    //   lex tie-break picks (a,b). round 3: [aa,ab] + [aa,b] →
    //   (aa,ab)=1, (aa,b)=1 → "ab" < "b" picks (aa,ab).
    val words = Seq("aaab", "aab").toDF("w")
    val merges = Bpe.train(words, "w", 3)
    assert(merges === Seq((("a", "a"), 3L), (("a", "b"), 1L), (("aa", "ab"), 1L)))
    val enc = words
      .select($"w", Bpe.encode($"w", merges.map(_._1)).as("s"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap
    assert(enc("aaab") === Seq("aaab")) // all three merges fire in order
    assert(enc("aab") === Seq("aa", "b")) // (a,b) never adjacent after merge 1
  }

  test("trainOnCounts == occurrence train; Scala merge pass == the column fold") {
    import spark.implicits._
    // weighted-dict training must equal per-occurrence training
    val words = Seq("aaab", "aab", "aaab", "ba").toDF("w")
    val wc = Seq(("aaab", 2L), ("aab", 1L), ("ba", 1L))
    assert(Bpe.trainOnCounts(wc, 3) === Bpe.train(words, "w", 3))
    // and on the real corpus word stream
    val stream = graft.Tables
      .documentsFanned(spark, "/root/testdata/sf0.001")
      .select(explode(graft.functions.Portable.tokens($"text")).as("w"))
      .filter($"w".rlike(Bpe.WordRe))
    val counts = stream.groupBy($"w").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(Bpe.trainOnCounts(counts, Bpe.EncodeMerges) === Bpe.train(stream, "w", Bpe.EncodeMerges))
    // Scala pass == column fold on every corpus word
    val merges = Bpe.trainOnCounts(counts, Bpe.EncodeMerges).map(_._1)
    counts.map(_._1).foreach { w =>
      val scala = merges.foldLeft(w.split("").toSeq) { case (s, (a, b)) => Bpe.mergePassScala(s, a, b) }
      val column = Seq(w).toDF("w")
        .select(Bpe.encode($"w", merges).as("s")).collect().head.getSeq[String](0)
      assert(scala === column, s"word $w")
    }
  }

  test("encodeDocs: per-doc counts decompose into word-level encodes; packing is consistent") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = Bpe.encodeDocs(spark, dir).collect()
    assert(out.nonEmpty)
    // independently re-derive: train on the same filtered word stream,
    // then per doc sum the sizes of per-word encodes
    val words = graft.Tables
      .documentsFanned(spark, dir)
      .select(explode(graft.functions.Portable.tokens($"text")).as("w"))
      .filter($"w".rlike(Bpe.WordRe))
    val merges = Bpe.train(words, "w", Bpe.EncodeMerges).map(_._1)
    val perDoc = graft.Tables
      .documents(spark, dir)
      .select($"doc_id", graft.functions.Portable.tokens($"text").as("ws"))
      .collect()
      .map { r =>
        val ws = r.getSeq[String](1).filter(_.matches(Bpe.WordRe))
        r.getLong(0) -> ws
      }
      .toMap
    val encWord = scala.collection.mutable.Map.empty[String, Seq[String]]
    def enc(w: String): Seq[String] = encWord.getOrElseUpdate(
      w,
      Seq(w).toDF("w").select(Bpe.encode($"w", merges).as("s")).collect().head.getSeq[String](0)
    )
    out.foreach { r =>
      val ws = perDoc(r.getLong(0))
      val syms = ws.flatMap(enc)
      assert(r.getLong(1) === syms.length.toLong, s"doc ${r.getLong(0)} token count")
      assert(r.getString(2) === syms.mkString(" "), s"doc ${r.getLong(0)} encoded text")
    }
    // packing: running offsets per shard over BPE counts, block bounds
    val byShard = out.groupBy(_.getLong(3))
    byShard.foreach { case (shard, rs) =>
      var cum = 0L
      rs.sortBy(_.getLong(0)).foreach { r =>
        val n = r.getLong(1)
        cum += n
        assert(r.getLong(0) % Sampling.PackShards === shard)
        assert(r.getLong(4) === (cum - n) / Sampling.PackBlockTokens, "start_block")
        assert(r.getLong(5) === math.max(cum - 1, 0L) / Sampling.PackBlockTokens, "end_block")
      }
    }
  }

  test("encodeDocs: vocabulary guard fails fast, pointing at the capped twin") {
    val dir = "/root/testdata/sf0.001"
    // the sf0.001 fixture vocabulary is far above 3 words, so a tiny
    // guard must trip; the collect itself is LIMIT-bounded, so the
    // failure is a thrown pointer, never a driver OOM
    val e = intercept[IllegalStateException](Bpe.encodeDocs(spark, dir, vocabGuard = 3))
    assert(e.getMessage.contains("text_bpe_encode_capped"))
    // the production default does not trip on the bounded fixture
    assert(Bpe.encodeDocs(spark, dir, Bpe.EncodeVocabGuard).limit(1).count() === 1L)
  }

  test("encodeDocsCapped: top-V dictionary, char fallback for OOV, merges on in-dict words") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val wc = graft.Tables
      .documentsFanned(spark, dir)
      .select(explode(graft.functions.Portable.tokens($"text")).as("w"))
      .filter($"w".rlike(Bpe.WordRe))
      .groupBy($"w").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // the cap must be EXERCISED: fixture vocabulary strictly exceeds V
    assert(wc.length > Bpe.EncodeCapV, s"fixture vocab ${wc.length} must exceed cap ${Bpe.EncodeCapV}")
    val topV = wc.sortBy { case (w, f) => (-f, w) }.take(Bpe.EncodeCapV)
    val dictWords = topV.map(_._1).toSet
    val merges = Bpe.trainOnCounts(topV, Bpe.EncodeMerges).map(_._1)
    def enc(w: String): Seq[String] =
      if (dictWords(w))
        merges.foldLeft(w.split("").toSeq) { case (s, (a, b)) => Bpe.mergePassScala(s, a, b) }
      else w.split("").toSeq // character fallback

    val out = Bpe.encodeDocsCapped(spark, dir).collect()
    val perDoc = graft.Tables
      .documents(spark, dir)
      .select($"doc_id", graft.functions.Portable.tokens($"text").as("ws"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.matches(Bpe.WordRe)))
      .toMap
    var oovMultiChar = false
    var mergedInDict = false
    out.foreach { r =>
      val ws = perDoc(r.getLong(0))
      ws.foreach { w =>
        if (!dictWords(w) && w.length >= 2) oovMultiChar = true
        if (dictWords(w) && enc(w).exists(_.length >= 2)) mergedInDict = true
      }
      val syms = ws.flatMap(enc)
      assert(r.getLong(1) === syms.length.toLong, s"doc ${r.getLong(0)} token count")
      assert(r.getString(2) === syms.mkString(" "), s"doc ${r.getLong(0)} encoded text")
    }
    assert(oovMultiChar, "the OOV char-fallback arm must be exercised by the fixture")
    assert(mergedInDict, "trained merges must apply to in-dictionary words")
  }

  test("pairStats matches manual counting on sf0.001 and is rank-total-ordered") {
    val rows = Bpe.pairStats(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === Bpe.PairTopK)
    // rank is 1..K aligned with (cnt desc, pair asc)
    val sorted = rows.sortBy(r => (-r.getLong(2), r.getString(1)))
    assert(rows.map(_.getLong(0)).toSeq === (1L to Bpe.PairTopK.toLong))
    assert(sorted.map(_.getLong(0)).toSeq === (1L to Bpe.PairTopK.toLong))
    // manual recount of the top pair from the raw corpus
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").collect()
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { r =>
      r.getAs[String]("text").toLowerCase.split("[ \t]", -1).foreach { w =>
        (0 until w.length - 1).foreach { i =>
          val p = w.substring(i, i + 2)
          counts(p) = counts.getOrElse(p, 0L) + 1
        }
      }
    }
    val top = rows.head
    val want = counts.toSeq.sortBy { case (p, c) => (-c, p) }.head
    assert((top.getString(1), top.getLong(2)) === want)
  }
}
