package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFns.tokens

/** Corpus-level planning operators for training-data pipelines — the
  * stages that decide WHAT of a curated corpus is trained on: a
  * leakage-free train/val/test split (near-duplicates must never
  * straddle a split boundary, or held-out loss is contaminated — the
  * reason dedup pipelines exist; cf. Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better"), hashed-n-gram
  * importance weights for target-distribution selection (the DSIR
  * recipe of Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"), and a per-source token-budget allocation
  * under a repeat cap (the data-constrained mixing question of
  * Muennighoff et al. 2023: when the budget exceeds a source's size ×
  * max epochs, where do the remaining tokens go?).
  *
  * Every operator is one corpus scan plus tiny post-aggregation
  * arithmetic: the split is a hash of a (possibly cluster-inherited)
  * group id, the importance weights are a two-level token re-agg with
  * a bucket-sized broadcast back in, and the budget allocation runs on
  * |sources| rows. All selection/assignment is deterministic md5
  * arithmetic (the [[Sampling]] contract) — rerun-stable, engine-
  * portable, partition-order-free.
  *
  * Capability extension beyond the reference surface (which ends at
  * dedup-by-unique-key — `src/ingest/create_indexes.py:13-23`); these
  * are the driver-mandated LLM-pipeline operators.
  */
object DataMix {

  /** Deterministic group-coherent train/val/test split.
    *
    * `clusters` is a (node, component) table — the near-dup cluster
    * assignment the dedup pipeline already computed (only paired docs
    * appear). Every doc inherits its cluster's id as its split GROUP
    * (unclustered docs group alone), and the split is a pure function
    * of md5(group): all members of a near-dup cluster land in the SAME
    * split by construction, so a train doc's near-duplicate can never
    * sit in val/test. Buckets are basis points: [0, trainBp) train,
    * [trainBp, valBp) val, [valBp, 10000) test.
    *
    * One equi-join (doc → cluster label) + per-row hash: no extra
    * shuffle beyond the join, no RNG state. Returns the row-level
    * frame (doc_id, source, n_chars, group_id, split) so callers can
    * either aggregate (the gate) or write the splits out. */
  def leakFreeSplit(docs: DataFrame, clusters: DataFrame, salt: String,
                    trainBp: Int = 8000, valBp: Int = 9000): DataFrame = {
    require(0 < trainBp && trainBp <= valBp && valBp <= 10000,
      s"need 0 < trainBp <= valBp <= 10000, got ($trainBp, $valBp)")
    val c = clusters.select(col("n").as("doc_id"), col("component"))
    val b = Sampling.hashBucket(col("group_id"), salt)
    docs.join(c, Seq("doc_id"), "left")
      .withColumn("group_id", coalesce(col("component"), col("doc_id")))
      .withColumn("split",
        when(b < trainBp, "train").when(b < valBp, "val").otherwise("test"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("group_id"), col("split"))
  }

  /** Hashed-feature bucket in [0, buckets) for a term — md5 over the
    * salted term, like [[Sampling.hashBucket]] but with a caller-sized
    * modulus (DSIR's hashed n-gram feature space). */
  def termBucket(term: Column, buckets: Int, salt: String): Column =
    conv(substring(md5(concat(term, lit(salt))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** DSIR-style importance log-ratio per document.
    *
    * Two unigram bag-of-words models over a hashed feature space of
    * `buckets` buckets — the TARGET distribution (docs where `isTarget`)
    * and the RAW distribution (the whole corpus) — both add-1
    * smoothed; each document scores the sum over its tokens of
    * log p_target(bucket) − log p_raw(bucket). High scores mark docs
    * whose token mix resembles the target slice: the selection signal
    * importance resampling feeds on.
    *
    * Shape: ONE corpus scan explodes tokens to (doc, is_target,
    * bucket) counts; the bucket-level model counts derive from that
    * same aggregate by re-aggregation (no second scan), and the
    * ≤`buckets`-row score table broadcasts back into the per-doc sum.
    * Portability: each bucket's log-ratio is rounded at DECIMAL(18,6)
    * (ln carries the usual ±1 ulp license — the q84 idiom) and the
    * per-doc total is the exact decimal sum count × score. */
  /** One corpus scan → per-(doc, target-flag, bucket) token counts —
    * the shared substrate of the DSIR model and the per-doc scoring.
    * Staged: it feeds the bucket model (two further re-aggs) AND the
    * per-doc scoring join; the same plan key also lets a streaming
    * scorer ([[graft.streaming.EventStream.runDsirScoreOnce]]) reuse
    * the batch-built model within a process. */
  private def dsirPerDoc(docs: DataFrame, isTarget: Column,
                         buckets: Int, salt: String): DataFrame =
    graft.engine.Staging.stagedByPlan(
      docs
        .select(col("doc_id"), isTarget.as("is_tgt"),
          explode(tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("is_tgt"),
          termBucket(col("term"), buckets, salt).as("b"))
        .agg(count(lit(1)).as("c")),
      "dsir_perdoc")

  /** The DSIR bucket model alone: (bucket, 6-dp log-ratio score) —
    * ≤ `buckets` rows, broadcastable; the "trained model" a scorer
    * (batch or streaming) applies to new documents. */
  def dsirBucketScores(docs: DataFrame, isTarget: Column,
                       buckets: Int, salt: String): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val bucketCounts = dsirPerDoc(docs, isTarget, buckets, salt)
      .groupBy(col("b"))
      .agg(sum(col("c")).as("raw_n"),
        sum(when(col("is_tgt"), col("c")).otherwise(lit(0L))).as("tgt_n"))
    val tot = bucketCounts.agg(sum(col("raw_n")).as("raw_tot"),
      sum(col("tgt_n")).as("tgt_tot"))
    bucketCounts.crossJoin(broadcast(tot))
      .select(col("b"),
        (log((col("tgt_n") + 1).cast("double") / (col("tgt_tot") + buckets)) -
          log((col("raw_n") + 1).cast("double") / (col("raw_tot") + buckets)))
          .cast(DecimalType(18, 6)).as("s"))
  }

  def dsirImportance(docs: DataFrame, isTarget: Column,
                     buckets: Int, salt: String): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val perDoc = dsirPerDoc(docs, isTarget, buckets, salt)
    val scores = dsirBucketScores(docs, isTarget, buckets, salt)
    perDoc.join(broadcast(scores), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("s")).as("w"))
      .select(col("doc_id"), col("n_tokens"),
        col("w").cast("double").as("dsir_logratio"))
  }

  /** Per-source token-budget allocation under a repeat cap.
    *
    * Given per-source token counts T_i, a total budget B = ΣT DIV
    * `budgetDen`, and a hard repeat ceiling of `capEpochs` epochs per
    * source: start from an equal share base = B DIV |sources|, cap
    * each source at capEpochs·T_i, and redistribute the freed budget
    * in one equal round across the sources that were NOT capped —
    * with the redistributed allocation ITSELF clamped at the ceiling
    * (a source whose headroom is smaller than its equal share of the
    * leftover would otherwise be pushed past capEpochs — e.g. tokens
    * {120, 1000, 8×1} at capEpochs = 1 gave the 120-token source 560
    * tokens ≈ 4.7 epochs before the clamp). The ceiling is therefore
    * HARD after redistribution too; budget the clamp strands joins
    * the sub-|sources| division remainder as deliberately
    * unallocated — exactness over completeness, a second
    * redistribution round buys ≤ one epoch-fraction at the cost of a
    * data-dependent iteration count. Output epochs_i = alloc_i / T_i
    * says how many times each source is repeated (never above
    * capEpochs).
    *
    * All arithmetic after the one corpus scan runs on |sources| rows
    * and is integer-exact (the single double division is the final
    * epochs readout) — the plan costs one hash agg regardless of SF. */
  def tokenBudgetMix(docs: DataFrame, budgetDen: Int = 2,
                     capEpochs: Int = 2): DataFrame = {
    require(budgetDen >= 1 && capEpochs >= 1, "degenerate budget/cap")
    // staged: the |sources|-row census subtree scans the corpus, and
    // it feeds both the totals agg and the allocation join
    val per = graft.engine.Staging.stagedByPlan(
      docs.groupBy(col("source"))
        .agg(sum(size(tokens(col("text"))).cast("long")).as("n_tokens")),
      "budget_census")
    allocFromCensus(per, budgetDen, capEpochs)
      .orderBy(col("source").asc)
  }

  /** [[tokenBudgetMix]]'s allocation arithmetic over an ALREADY
    * computed per-source token census (source, n_tokens) — shared with
    * [[manifestFromCells]], where the census re-aggregates from merged
    * manifest cells instead of a corpus scan. Output: (source,
    * n_tokens, alloc_tokens, epochs), unordered. */
  private def allocFromCensus(per: DataFrame, budgetDen: Int,
                              capEpochs: Int): DataFrame = {
    require(budgetDen >= 1 && capEpochs >= 1, "degenerate budget/cap")
    val tot = per.agg(sum(col("n_tokens")).as("t_tot"),
      count(lit(1)).as("n_src"))
    val based = per.crossJoin(broadcast(tot))
      .withColumn("budget", expr(s"t_tot DIV $budgetDen"))
      .withColumn("base", expr("budget DIV n_src"))
      .withColumn("capped", least(col("base"), col("n_tokens") * capEpochs))
      .withColumn("uncapped", col("n_tokens") * capEpochs > col("base"))
    val leftover = based.agg(sum(col("capped")).as("sum_capped"),
      sum(when(col("uncapped"), 1L).otherwise(0L)).as("n_unc"))
    based.crossJoin(broadcast(leftover))
      // the clamp keeps the repeat ceiling hard through redistribution
      .withColumn("alloc_tokens", least(
        col("capped") +
          when(col("uncapped"), expr("(budget - sum_capped) DIV n_unc"))
            .otherwise(lit(0L)),
        col("n_tokens") * capEpochs))
      .select(col("source"), col("n_tokens"), col("alloc_tokens"),
        round(col("alloc_tokens").cast("double") / col("n_tokens"), 6)
          .as("epochs"))
  }

  /** Temperature-smoothed mixture rates — the exponentiated-smoothing
    * rule of multilingual pretraining (Devlin et al. 2019 mBERT, α
    * exponent; Conneau & Lample 2019 XLM, α = 0.5): sources are
    * sampled proportionally to p_s^α instead of p_s, boosting
    * low-resource sources without flattening the mix. Fixed α = ½ here
    * so the weight is `sqrt` — IEEE-correctly-rounded in BOTH engines
    * (an arbitrary `pow` is libm-dependent and NOT portable), then
    * integerized once (⌊√tokens·10³+½⌋, the round-half-up idiom) so
    * everything downstream is exact integer arithmetic:
    *
    *   rate_bp(s) = min(10⁴, ⌊10⁴·w_s·B / (W·tokens_s)⌋),
    *   B = Σtokens DIV budgetDen, w_s = ⌊√tokens_s·10³+½⌋, W = Σw_s
    *
    * (cross-multiplied in DECIMAL(38,0), quotient via integral `div` —
    * the df-band discipline; exact at any corpus the DECIMAL holds).
    * Membership is then [[Sampling.hashBucket]] < rate_bp — the same
    * pure-function-of-(doc_id, salt) contract as every sampler here,
    * so the kept set is rerun-stable and engine-portable. One corpus
    * scan for the census (staged), one broadcast of the |sources|-row
    * rate table back onto the corpus for the kept rollup. Output per
    * source: census, rate_bp, kept docs/tokens. */
  def temperatureMix(docs: DataFrame, budgetDen: Int,
                     salt: String): DataFrame = {
    require(budgetDen >= 1, "degenerate budget")
    val per = graft.engine.Staging.stagedByPlan(
      docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(tokens(col("text"))).cast("long")).as("n_tokens")),
      "temp_census")
    val wi = per.withColumn("__wi",
      floor(sqrt(col("n_tokens").cast("double")) * 1000 + 0.5))
    val tot = wi.agg(sum(col("__wi")).as("__W"),
      sum(col("n_tokens")).as("__T"))
    // DOMAIN GUARD on the cross-multiplication: past DECIMAL(38,0) the
    // non-ANSI product (or the `div` LONG narrowing) goes NULL —
    // Spark's `least` would then silently keep the 10000 arm (full
    // keep) while the DuckDB oracle's HUGEINT errors loudly, the
    // silent-vs-loud divergence the raise_error narrowing discipline
    // exists to prevent (shingleDfProfile's cum_fanout guard is the
    // template). The in-domain quotient is ≤ 10⁴·T/tokens_s (W ≥ wi),
    // far inside LONG for any corpus the DECIMAL product holds, so a
    // NULL quotient can only mean out-of-domain inputs; a zero-token
    // source (division by zero → NULL) gets the same loudness — DuckDB
    // errors there too.
    val rated = wi.crossJoin(broadcast(tot))
      .withColumn("__rr",
        expr(s"(CAST(__wi AS DECIMAL(38,0)) * (__T DIV $budgetDen) * 10000)" +
          " div (CAST(__W AS DECIMAL(38,0)) * n_tokens)"))
      .withColumn("rate_bp", least(lit(10000L),
        when(col("__rr").isNotNull, col("__rr"))
          .otherwise(raise_error(concat(
            lit("temperatureMix rate out of integer domain for source "),
            col("source"))).cast("long"))))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("rate_bp"))
    val kept = docs
      .join(broadcast(rated.select(col("source"), col("rate_bp"))),
        Seq("source"))
      .filter(Sampling.hashBucket(col("doc_id"), salt) < col("rate_bp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("n_kept_tokens"))
    // both sides are |sources|-row tables; broadcast keeps the final
    // rollup join shuffle-free (and the plan pin strict: no SMJ
    // anywhere in the query)
    rated.join(broadcast(kept), Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("rate_bp"),
        coalesce(col("n_kept_docs"), lit(0L)).as("n_kept_docs"),
        coalesce(col("n_kept_tokens"), lit(0L)).as("n_kept_tokens"))
  }

  /** Per-(split × source) TRAINING MANIFEST — the table a training
    * launcher actually consumes: [[leakFreeSplit]]'s split assignment
    * and [[tokenBudgetMix]]'s per-source allocation composed into one
    * (split, source, n_docs, n_tokens, alloc_tokens, epochs) rollup.
    *
    * Each source's budget allocation is apportioned across its splits
    * in EXACT integer proportion to split token mass
    * (alloc·cell_tokens DIV src_tokens — floor division, so split
    * allocations can under-run the source allocation by < |splits|
    * tokens and can never over-run it; the reconciliation spec pins
    * both directions). Shape: the split assignment is one equi-join +
    * per-row hash, both rollups are single hash aggs, and the
    * |sources|-row allocation table broadcasts into the |splits|×
    * |sources|-row cell table — nothing here scales with corpus size
    * except the two scans the parents already make (and the census
    * subtree is staged, so the corpus is scanned once for both).
    * Domain: alloc·cell_tokens runs in BIGINT — exact while
    * Σtokens² < 2⁶³ (≈ 3·10⁹ tokens; the fixture ceiling is 2·10⁷).
    * A century-scale corpus lifts the product into DECIMAL(38,0);
    * the apportionment rule itself is unchanged. */
  def trainManifest(docs: DataFrame, clusters: DataFrame, salt: String,
                    trainBp: Int, valBp: Int,
                    budgetDen: Int, capEpochs: Int): DataFrame =
    manifestFromCells(manifestCells(docs, clusters, salt, trainBp, valBp),
      budgetDen, capEpochs)

  /** The ADDITIVE half of the manifest: (split, source, n_docs,
    * n_tokens) census cells over the corpus — pure counts, so two
    * corpora's (or a corpus's and an increment's) cell tables merge by
    * SUMMING per key, and the full manifest re-derives from the merged
    * cells via [[manifestFromCells]] (trainManifest ≡ the composition,
    * by construction). This split is what makes the manifest
    * incrementally maintainable: the budget/allocation half is a pure
    * function of the census, never of the documents. */
  def manifestCells(docs: DataFrame, clusters: DataFrame, salt: String,
                    trainBp: Int, valBp: Int): DataFrame = {
    val sp = leakFreeSplit(docs, clusters, salt, trainBp, valBp)
      .select(col("doc_id"), col("split"))
    docs
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("__tok"))
      .join(sp, Seq("doc_id"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"))
  }

  /** Sum-merge of manifest cell tables (corpus ⊎ increment ⊎
    * corrections): counts add per (split, source) key. A CORRECTION
    * table carries negative counts (retract the stale census of a
    * cluster the increment touched, then add its re-censused rows —
    * see [[graft.SparkEntry]] q218); cells summing to zero docs are
    * dropped, matching a from-scratch census that never saw them. */
  def mergeCells(cells: DataFrame*): DataFrame =
    cells.reduce(_ unionByName _)
      .groupBy(col("split"), col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
      .filter(col("n_docs") =!= 0)

  /** Sign-flip of a cell table — the retraction half of a census
    * correction. */
  def negateCells(cells: DataFrame): DataFrame =
    cells.select(col("split"), col("source"),
      (-col("n_docs")).as("n_docs"), (-col("n_tokens")).as("n_tokens"))

  /** The manifest's allocation half, derived from cells alone: the
    * per-source token census re-aggregates from the (census-sized)
    * cell table, [[tokenBudgetMix]]'s allocation arithmetic runs on
    * it, and each source's allocation apportions across its splits in
    * exact integer proportion to split token mass (see
    * [[trainManifest]]'s domain notes — unchanged). */
  def manifestFromCells(cells: DataFrame,
                        budgetDen: Int, capEpochs: Int): DataFrame = {
    val per = cells.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("n_tokens"))
    val alloc = allocFromCensus(per, budgetDen, capEpochs)
      .select(col("source"), col("n_tokens").as("__src_tokens"),
        col("alloc_tokens").as("__src_alloc"))
    cells.join(broadcast(alloc), Seq("source"))
      .withColumn("alloc_tokens",
        when(col("__src_tokens") > 0,
          expr("__src_alloc * n_tokens DIV __src_tokens")))
      .select(col("split"), col("source"), col("n_docs"), col("n_tokens"),
        col("alloc_tokens"),
        round(col("alloc_tokens").cast("double") /
          when(col("n_tokens") > 0, col("n_tokens")), 6).as("epochs"))
      .orderBy(col("split").asc, col("source").asc)
  }
}
