package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the full corpus; per-partition scoring, global rank per query.
  * Scale path: [[lshBucketedKnn]] pre-buckets vectors by random-hyperplane
  * signs so each query only scores its bucket (candidate set shrinks by
  * ~2^bits), the standard sub-linear ANN shape when the corpus no longer
  * fits a cross join.
  *
  * Dot products use the custom codegen'd [[graft.functions.DotProduct]]
  * expression (sequential left-to-right summation → deterministic,
  * engine-portable float order; the HOF alternative evaluates
  * interpreted). Elements are cast float→double (exact) before any
  * arithmetic.
  */
object Similarity {

  /** embedding column cast to Array[Double] (exact widening). */
  def asDouble(vec: Column): Column = vec.cast(ArrayType(DoubleType))

  /** Dot product via the custom codegen'd Catalyst expression
    * ([[graft.functions.DotProduct]]): the HOF form
    * (aggregate ∘ zip_with) evaluates interpreted and breaks whole-stage
    * codegen on the KNN hot path. Same left-to-right summation order. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dot(a, b)

  def l2norm(vec: Column): Column = sqrt(dot(vec, vec))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Per-vector L2 norms and dimensionality. */
  def norms(emb: DataFrame): DataFrame = {
    val v = asDouble(col("embedding"))
    emb.select(col("vec_id"), size(col("embedding")).cast("long").as("dim"),
      l2norm(v).as("l2_norm"))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded). Ranks are computed on cosine rounded
    * to 6 decimals with vec_id tie-break, so results are reproducible. */
  def bruteForceKnn(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_vec"),
      asDouble(col("embedding")).as("q_emb"))
    val c = emb.select(col("vec_id").as("n_vec"),
      asDouble(col("embedding")).as("n_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_vec") =!= col("n_vec"))
      .withColumn("cosine", round(cosine(col("q_emb"), col("n_emb")), 6))
    val w = Window.partitionBy(col("q_vec"))
      .orderBy(col("cosine").desc, col("n_vec").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_vec"), col("n_vec"), col("cosine"), col("rank"))
  }

  /** Per-label element-wise centroids — the coarse-quantizer building
    * block of an IVF index (and per-class mean embeddings generally).
    * posexplode → (label, dim) grouped avg: one shuffle carrying
    * |labels| × dims rows after partial aggregation. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(asDouble(col("embedding"))))
      .select(col("label"), (col("pos") + 1).cast("long").as("dim"), col("col").as("v"))
      .groupBy(col("label"), col("dim"))
      .agg(avg(col("v")).as("centroid"))

  /** Embedding-cosine near-duplicate pairs: all (a < b) with cosine ≥
    * threshold. Exact O(n²) form — at corpus scale, generate candidates
    * with [[lshBucketedKnn]]/[[ivfKnn]] blocking first and reserve this
    * as the verify step over candidates. */
  def nearDupPairs(emb: DataFrame, minCosine: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("vec_a"), asDouble(col("embedding")).as("va"))
    val b = emb.select(col("vec_id").as("vec_b"), asDouble(col("embedding")).as("vb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", round(cosine(col("va"), col("vb")), 6))
      .filter(col("cosine") >= minCosine)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** IVF-style ANN: the corpus is partitioned into inverted lists by
    * nearest coarse centroid; each query scores only the lists of its
    * `nProbe` nearest centroids. With |centroids| = √n lists this turns
    * the n·q cross join into ~q·nProbe·√n scored pairs — the standard
    * sub-linear ANN layout. Centroids come in (centroid_id, dim, value)
    * row form — either [[labelCentroids]] naming (label, dim, centroid)
    * or [[KMeansQuantizer.fit]] naming (centroid_id, dim, c); both are
    * accepted. Assignments and ranks break ties on rounded cosine + id,
    * so the result is deterministic. */
  def ivfKnn(emb: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: Int, nProbe: Int): DataFrame = {
    // (centroid_id, dim, value) rows → (centroid_id, cvec Array[Double])
    val cc = centroids.columns.toSet
    require(cc.contains("dim") && (cc.contains("label") || cc.contains("centroid_id"))
        && (cc.contains("centroid") || cc.contains("c")),
      s"ivfKnn centroids must have columns (label|centroid_id, dim, centroid|c); " +
        s"got (${centroids.columns.mkString(", ")})")
    val cId = if (cc.contains("centroid_id")) col("centroid_id") else col("label")
    val cVal = if (cc.contains("centroid")) col("centroid") else col("c")
    val centVecs = centroids
      .groupBy(cId.as("centroid_id"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), cVal.as("centroid")))),
        x => x.getField("centroid")).as("cvec"))
    def assign(vecs: DataFrame, idCol: String, vecCol: String, keep: Int): DataFrame = {
      val scored = vecs.crossJoin(broadcast(centVecs))
        .withColumn("c_cos", round(cosine(col(vecCol), col("cvec")), 6))
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("c_cos").desc, col("centroid_id").asc)
      scored.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= keep)
        .drop("__r", "c_cos", "cvec")
    }
    val corpus = assign(
      emb.select(col("vec_id").as("n_vec"), asDouble(col("embedding")).as("n_emb")),
      "n_vec", "n_emb", keep = 1)
    val probes = assign(
      queries.select(col("vec_id").as("q_vec"), asDouble(col("embedding")).as("q_emb")),
      "q_vec", "q_emb", keep = nProbe)
    val scored = corpus.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("q_vec") =!= col("n_vec"))
      .withColumn("cosine", round(cosine(col("q_emb"), col("n_emb")), 6))
    val w = Window.partitionBy(col("q_vec"))
      .orderBy(col("cosine").desc, col("n_vec").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_vec"), col("n_vec"), col("cosine"), col("rank"))
  }

  /** LSH-bucketed ANN: sign-bit signature over `planes` pseudo-random
    * hyperplanes (deterministic from the vector itself via index-seeded
    * element signs), queries scored only against same-bucket vectors.
    * Approximate by construction; at 100 TB the bucket join replaces the
    * cross join and candidate counts drop by ~2^planes. */
  def lshBucketedKnn(emb: DataFrame, queries: DataFrame, k: Int, planes: Int): DataFrame = {
    def bucket(vec: Column): Column = {
      // plane p: sign of the projection Σ v(i) · w_p(i) with deterministic
      // pseudo-random weights w_p(i) = (i · m_p) mod 7 − 3 ∈ [−3, 3]; the
      // multiplier m_p = (p mod 6) + 1 is never ≡ 0 (mod 7), so no plane
      // degenerates to a constant-weight projection
      val sig = (0 until planes).map { p =>
        val m = (p % 6) + 1
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, i) => x * ((i * lit(m)) % 7 - 3).cast("double")),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0, lit(1L << p)).otherwise(lit(0L))
      }
      sig.reduce(_ + _)
    }
    val c = emb.select(col("vec_id").as("n_vec"),
      asDouble(col("embedding")).as("n_emb"))
      .withColumn("bucket", bucket(col("n_emb")))
    val q = queries.select(col("vec_id").as("q_vec"),
      asDouble(col("embedding")).as("q_emb"))
      .withColumn("bucket", bucket(col("q_emb")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_vec") =!= col("n_vec"))
      .withColumn("cosine", round(cosine(col("q_emb"), col("n_emb")), 6))
    val w = Window.partitionBy(col("q_vec"))
      .orderBy(col("cosine").desc, col("n_vec").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_vec"), col("n_vec"), col("cosine"), col("rank"))
  }
}
