package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFns.tokens

/** Closed-form text classification for a curation pipeline — the
  * quality/domain-classifier stage (a fastText-style source classifier
  * is standard curation equipment, e.g. the CommonCrawl quality filters
  * of GPT-3/CCNet lineage) expressed with an EXACTLY reproducible
  * model: multinomial naive Bayes over a hashed token space, trained
  * and applied in the same declarative plan. No gradient loop, no RNG —
  * the model is two aggregations of corpus counts, so the oracle can
  * rebuild it verbatim in SQL and the gate hash-checks train AND apply
  * end to end (the same train-then-apply unification the DSIR family
  * pins for streams).
  *
  * Capability extension beyond the reference surface (reference ends at
  * aggregation pipelines); driver-mandated LLM-pipeline operator.
  */
object Classify {

  /** Multinomial naive-Bayes self-classification confusion matrix.
    *
    * Train: per-source token-bucket counts over a `buckets`-wide hashed
    * feature space ([[DataMix.termBucket]]), add-1 smoothed:
    * log p(b|s) = ln((cnt_sb + 1)/(tok_s + buckets)), plus a doc-count
    * log-prior per source — each rounded at DECIMAL(18,6) (the q84 ln
    * license), so every downstream sum is exact decimal arithmetic and
    * the argmax is merge-order-free.
    *
    * Apply: every doc scores every source — score(d, s) = prior_s +
    * Σ_b c_db · logp(b|s) over the doc's PRESENT buckets (standard
    * multinomial NB) — and predicts the argmax, ties to the
    * lexicographically first source. Output: the (true source ×
    * predicted source) confusion matrix, the self-classification audit
    * that says which sources are separable by token mix alone.
    *
    * Shape: ONE corpus scan lands the staged per-(doc, bucket) count
    * table (it feeds the model re-agg AND the scoring join); the model
    * is ≤ |sources|·buckets rows (broadcast); the per-doc argmax is a
    * window over |sources| rows per doc, partitioned by doc. Linear in
    * corpus tokens, like DSIR with a |sources|-wide score fan-out.
    * Docs with zero tokens have no feature rows and are absent (both
    * engines). */
  def naiveBayesSourceConfusion(docs: DataFrame, buckets: Int,
                                salt: String): DataFrame =
    naiveBayesPredictions(docs, buckets, salt)
      .groupBy(col("source"), col("pred_source"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source").asc, col("pred_source").asc)

  /** The per-document predictions under the confusion matrix:
    * (doc_id, source, pred_source). Exposed so downstream rollups (the
    * q200 quality scorecard's self-accuracy signal) reuse the trained
    * model instead of re-deriving it. */
  def naiveBayesPredictions(docs: DataFrame, buckets: Int,
                            salt: String): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val db = graft.engine.Staging.stagedByPlan(
      docs.select(col("doc_id"), col("source"),
          explode(tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("source"),
          DataMix.termBucket(col("term"), buckets, salt).as("b"))
        .agg(count(lit(1)).as("c")),
      "nb_docbucket")
    val srcTot = db.groupBy(col("source"))
      .agg(sum(col("c")).as("tok_s"), countDistinct(col("doc_id")).as("nd"))
    val nAll = srcTot.agg(sum(col("nd")).as("n_all"))
    // dense (source × seen-bucket) grid: the add-1 term must exist for
    // buckets a source never emitted, or an unseen bucket would score 0
    // instead of the smoothing penalty
    val sb = db.groupBy(col("source"), col("b")).agg(sum(col("c")).as("sc"))
    val model = srcTot.crossJoin(db.select(col("b")).distinct())
      .join(sb, Seq("source", "b"), "left")
      .select(col("source").as("m_src"), col("b"),
        log((coalesce(col("sc"), lit(0L)) + 1).cast("double") /
            (col("tok_s") + buckets))
          .cast(DecimalType(18, 6)).as("lp"))
    val priors = srcTot.crossJoin(broadcast(nAll))
      .select(col("source").as("m_src"),
        log(col("nd").cast("double") / col("n_all"))
          .cast(DecimalType(18, 6)).as("prior"))
    val scores = db.join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"), col("source"), col("m_src"))
      .agg(sum(col("c") * col("lp")).as("ll"))
      .join(broadcast(priors), Seq("m_src"))
      .withColumn("score", col("ll") + col("prior"))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("m_src").asc)
    scores.withColumn("__r", row_number().over(wDoc))
      .filter(col("__r") === 1)
      .select(col("doc_id"), col("source"), col("m_src").as("pred_source"))
  }
}
