package graft.dedup

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the core of an LLM
  * training-data pipeline. Five variants, each picked for a different
  * point on the exactness/scale curve; all are oracle-checked EXACTLY
  * because the oracle replays the same deterministic algorithm (see
  * graft.oracle.PipelineOracles).
  *
  * Scale design (100 TB): everything here is inverted-index or
  * signature-bucket joins — no all-pairs comparison ever materializes.
  * Hot shingles/buckets are the skew risk; AQE skew-join splitting
  * handles moderate skew, and stop-shingle filtering (drop shingles with
  * document frequency above a cap) is the standard mitigation at extreme
  * scale.
  */
object Dedup {

  val MinhashSeeds = 4 // 4 md5 evaluations × 4 chunks = 16 minhashes
  val MinhashK = 16
  val JaccardThreshold = 0.5
  val NgramThreshold = 0.5
  val SimhashBits = 32
  val SimhashMaxHamming = 3
  val SimhashBands = 4 // 4 bands × 8 bits; hamming ≤ 3 ⇒ ≥1 band equal (pigeonhole)
  val EmbedPlanes = 16
  val EmbedBands = 4 // 4 bands × 4 bits
  val EmbedCosThreshold = 0.4

  /** Exact dedup: group by md5(text); keeper = min doc_id per hash. One
    * shuffle on the 128-bit hash — the canonical 100 TB-safe exact dedup.
    */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .groupBy(md5($"text").as("text_hash"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keep_id")
  }

  /** doc_id → distinct 3-shingle rows (the inverted-index edge list). */
  private def shingleRows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select($"doc_id", explode(shingles(tokens($"text"))).as("sh"))
  }

  /** Exact pairwise Jaccard ≥ threshold for a pair set. `pairs` must have
    * columns (id_a, id_b); shingle sets are joined in as arrays.
    */
  private def verifyJaccard(spark: SparkSession, dir: String, pairs: DataFrame, threshold: Double): DataFrame = {
    import spark.implicits._
    val sets = Tables
      .documents(spark, dir)
      .select($"doc_id", shingles(tokens($"text")).as("shs"))
    pairs
      .join(sets.select($"doc_id".as("id_a"), $"shs".as("sa")), "id_a")
      .join(sets.select($"doc_id".as("id_b"), $"shs".as("sb")), "id_b")
      .withColumn("inter", size(array_intersect($"sa", $"sb")).cast("long"))
      .withColumn(
        "jaccard",
        round($"inter" / (size($"sa") + size($"sb") - $"inter").cast("long"), 6)
      )
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
      .orderBy($"id_a", $"id_b")
  }

  /** Exact n-gram Jaccard dedup via inverted-index join: candidate pairs
    * are documents sharing ≥1 shingle (a superset of Jaccard > 0, so this
    * is EXACT), then verified. Shuffle cost ∝ Σ df(shingle)² — bounded by
    * stop-shingle capping at extreme scale.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = shingleRows(spark, dir)
    val cand = sh
      .as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    verifyJaccard(spark, dir, cand, NgramThreshold)
  }

  /** MinHash signatures: 16 per document (min over shingles of four
    * md5-derived 32-bit hashes × four chunks).
    */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = shingleRows(spark, dir)
    val hashCols = for (s <- 0 until MinhashSeeds; c <- 0 until 4)
      yield min(md5Chunk($"sh", s, c)).as(s"mh${s * 4 + c}")
    sh.groupBy($"doc_id").agg(hashCols.head, hashCols.tail: _*)
  }

  /** MinHash + LSH dedup: b=16 bands of r=1 row — a candidate is any pair
    * agreeing on ≥1 of the 16 minhashes (for true Jaccard J the miss
    * probability is (1-J)^16 ≤ 1.5e-5 at J=0.5, ~1e-27 for the planted
    * 0.98 near-dups) — then exact-Jaccard verification removes all false
    * positives. At 100 TB only signatures shuffle (16 longs/doc), never
    * text.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sig = minhashSignatures(spark, dir)
    val melted = sig.select(
      $"doc_id",
      posexplode(array((0 until MinhashK).map(i => col(s"mh$i")): _*)).as(Seq("band", "mh"))
    )
    val cand = melted
      .as("a")
      .join(
        melted.as("b"),
        col("a.band") === col("b.band") && col("a.mh") === col("b.mh") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    verifyJaccard(spark, dir, cand, JaccardThreshold)
  }

  /** 32-bit SimHash per document: bit j is set iff Σ_tokens ±1 > 0, where
    * the sign comes from bit j of the token's md5 (nibbles 1..8).
    */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables
      .documents(spark, dir)
      .select($"doc_id", explode(array_distinct(tokens($"text"))).as("tok"))
    val nibCols = col("doc_id") +: (1 to SimhashBits / 4).map(p => md5Nibble($"tok", p).as(s"nib$p"))
    val nib = tok.select(nibCols: _*)
    val sumCols = (0 until SimhashBits).map { j =>
      val nibble = col(s"nib${j / 4 + 1}")
      val bit = shiftright(nibble, j % 4).bitwiseAND(lit(1))
      sum(when(bit === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val sums = nib.groupBy($"doc_id").agg(sumCols.head, sumCols.tail: _*)
    sums.select(
      $"doc_id",
      (0 until SimhashBits)
        .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
        .as("simhash")
    )
  }

  /** SimHash near-dup pairs with hamming distance ≤ 3, found EXACTLY via
    * 4×8-bit band buckets: ≤3 differing bits cannot touch all 4 bands, so
    * every qualifying pair collides in ≥1 band (pigeonhole — no
    * probabilistic recall loss). Bucket join + bit_count filter; at
    * 100 TB only (band, 8-bit value, doc_id) triples shuffle.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sig = simhashSignatures(spark, dir)
    val banded = sig.select(
      $"doc_id",
      $"simhash",
      posexplode(
        array(
          (0 until SimhashBands).map(b =>
            shiftright($"simhash", b * 8).bitwiseAND(lit(255L))
          ): _*
        )
      ).as(Seq("band", "bucket"))
    )
    banded
      .as("a")
      .join(
        banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .select(
        col("a.doc_id").as("id_a"),
        col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming")
      )
      .distinct()
      .filter($"hamming" <= SimhashMaxHamming)
      .orderBy($"id_a", $"id_b")
  }

  /** Embedding near-dup: 16 random-hyperplane LSH bits, 4×4-bit bands for
    * candidates, exact cosine verification ≥ 0.4. Approximate recall by
    * design (documented LSH tradeoff); the oracle replays the identical
    * algorithm so the check is still exact. At scale: signatures are one
    * long per vector; candidates shuffle within buckets only.
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planes = hyperplanes(EmbedPlanes, 64)
    val emb = Tables
      .embeddings(spark, dir)
      .select(
        $"vec_id",
        $"embedding",
        lshSignature($"embedding", planes).as("sig"),
        norm($"embedding").as("nrm")
      )
    val banded = emb.select(
      $"vec_id",
      posexplode(
        array(
          (0 until EmbedBands).map(b => shiftright($"sig", b * 4).bitwiseAND(lit(15L))): _*
        )
      ).as(Seq("band", "bucket"))
    )
    val cand = banded
      .as("a")
      .join(
        banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id")
      )
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    cand
      .join(emb.select($"vec_id".as("id_a"), $"embedding".as("ea"), $"nrm".as("na")), "id_a")
      .join(emb.select($"vec_id".as("id_b"), $"embedding".as("eb"), $"nrm".as("nb")), "id_b")
      .withColumn("cosine", dot($"ea", $"eb") / ($"na" * $"nb"))
      .filter($"cosine" >= EmbedCosThreshold)
      .select($"id_a", $"id_b", round($"cosine", 6).as("cosine"))
      .orderBy($"id_a", $"id_b")
  }
}
