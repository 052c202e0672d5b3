package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at training-data-pipeline scale.
  *
  * MinHash+LSH: shingle → 64 minhash permutations (64 codegen'd agg
  * expressions, no explode blowup) → 16 bands x 4 rows → band-bucket
  * self-join → exact-Jaccard verification of the (few) candidates.
  * Sub-quadratic: only docs sharing a band bucket ever pair, and the exact
  * check runs on candidates only. SimHash: 64-bit signature from token
  * hashes; near-dups via 4x16-bit band join + bit_count Hamming filter
  * (pigeonhole: distance <= 3 pairs always share a band).
  */
object DedupOps {
  final val NumPerms = 64
  final val NumBands = 16
  final val RowsPerBand = NumPerms / NumBands

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Distinct character-trigram shingle hashes per doc. */
  private[operators] def shingleHashes(d: DataFrame): DataFrame = {
    val grams = when(length(col("text")) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(col("text")) - 2),
        i => col("text").substr(i, lit(3))))
    d.select(col("doc_id"), explode(grams).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h"))
      .distinct()
  }

  /** doc_id -> 64-long minhash signature as one row of 64 min-agg columns.
    * The i-th "permutation" is xxhash64(i, shingleHash) — codegen'd, no
    * multiply-overflow under ANSI mode, independent per i.
    */
  private[operators] def signatures(sh: DataFrame): DataFrame = {
    val minCols: Seq[Column] = (0 until NumPerms).map { i =>
      min(xxhash64(lit(i), col("h"))).as(s"m$i")
    }
    sh.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
  }

  /** Candidate near-dup pairs via LSH banding + exact Jaccard verification.
    * Output: (doc_a, doc_b, est_sim, jaccard) for pairs with jaccard >= minJaccard.
    */
  def dedupMinHash(spark: SparkSession, dir: String, minJaccard: Double = 0.5): DataFrame =
    minHashPairs(docs(spark, dir), minJaccard)

  def minHashPairs(d: DataFrame, minJaccard: Double): DataFrame = {
    val sh = shingleHashes(d)
    val sig = signatures(sh)
      .withColumn("sig", array((0 until NumPerms).map(i => col(s"m$i")): _*))
      .select("doc_id", "sig")
    val bands = sig.select(col("doc_id"),
      posexplode(array((0 until NumBands).map { b =>
        xxhash64((b * RowsPerBand until (b + 1) * RowsPerBand).map(i => col("sig")(i)): _*)
      }: _*)).as(Seq("band", "bh")))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // estimated similarity from signature agreement
    val withEst = cand
      .join(sig.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sig", "sig_a"), "doc_a")
      .join(sig.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sig", "sig_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / NumPerms, 4).as("est_sim"))
    // exact verification on candidates only (sets are per-doc bounded);
    // prefilter on signature agreement cuts the verification join for
    // candidates whose estimated similarity is far below the gate
    val sets = sh.groupBy("doc_id").agg(collect_set(col("h")).as("hs"))
    withEst
      .where(col("est_sim") >= minJaccard - 0.15)
      .join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("hs", "hs_a"), "doc_a")
      .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("hs", "hs_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("est_sim"),
        round(size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_union(col("hs_a"), col("hs_b"))).cast("double"), 4).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash per doc from whitespace-token hashes. */
  def simHashSignatures(d: DataFrame): DataFrame = {
    val toks = d.select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums: Seq[Column] = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i => when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash signatures + near-dup pairs at Hamming distance <= 3 via the
    * 4x16-bit band join. Output: (doc_a, doc_b, hamming).
    */
  def dedupSimHash(spark: SparkSession, dir: String): DataFrame =
    simHashPairs(docs(spark, dir))

  def simHashPairs(d: DataFrame): DataFrame = {
    val sig = simHashSignatures(d)
    val chunks = sig.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xffffL)): _*)).as(Seq("chunk", "cv")))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }
}
