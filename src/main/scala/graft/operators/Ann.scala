package graft.operators

import org.apache.spark.sql.DataFrame

/** Unified ANN surface: build an [[Ann.Index]] once (fit/bucketing
  * strategy chosen per corpus scale), then `search` it with any query
  * set. Every index returns the same schema — (q_vec, n_vec, cosine,
  * rank) with rank 1..k per query, cosine rounded and ties broken on
  * id — so callers swap strategies without touching downstream code:
  *
  *   - [[Ann.bruteForce]]: exact, O(n·q) scored pairs. The correctness
  *     baseline; right up to ~10⁵·10³ pairs.
  *   - [[Ann.lsh]]: random-hyperplane signature buckets; only same-
  *     bucket pairs are scored. No training step; recall tunable via
  *     `planes` (fewer planes ⇒ bigger buckets ⇒ higher recall+cost).
  *   - [[Ann.ivfFromLabels]]: inverted lists from per-label centroids
  *     (no training; requires a meaningful `label` column).
  *   - [[Ann.ivfTrained]]: inverted lists from a Lloyd k-means-fitted
  *     quantizer ([[KMeansQuantizer]]); √n lists turn n·q into
  *     ~q·nProbe·√n — the sub-linear scale path.
  */
object Ann {

  sealed trait Index {
    /** Top-k cosine neighbours per query row: (q_vec, n_vec, cosine, rank). */
    def search(queries: DataFrame, k: Int): DataFrame
  }

  final case class BruteForceIndex(corpus: DataFrame) extends Index {
    override def search(queries: DataFrame, k: Int): DataFrame =
      Similarity.bruteForceKnn(corpus, queries, k)
  }

  final case class LshIndex(corpus: DataFrame, planes: Int) extends Index {
    override def search(queries: DataFrame, k: Int): DataFrame =
      Similarity.lshBucketedKnn(corpus, queries, k, planes)
  }

  final case class IvfIndex(corpus: DataFrame, centroids: DataFrame,
                            nProbe: Int) extends Index {
    override def search(queries: DataFrame, k: Int): DataFrame =
      Similarity.ivfKnn(corpus, queries, centroids, k, nProbe)
  }

  def bruteForce(corpus: DataFrame): Index = BruteForceIndex(corpus)

  def lsh(corpus: DataFrame, planes: Int = 8): Index = LshIndex(corpus, planes)

  def ivfFromLabels(corpus: DataFrame, nProbe: Int = 2): Index =
    IvfIndex(corpus, Similarity.labelCentroids(corpus), nProbe)

  /** Trains the coarse quantizer with `kCentroids` Lloyd centroids over
    * `iters` iterations, then serves IVF searches against it. */
  def ivfTrained(corpus: DataFrame, kCentroids: Int, iters: Int,
                 nProbe: Int = 2): Index =
    IvfIndex(corpus, KMeansQuantizer.fit(corpus, kCentroids, iters), nProbe)
}
