package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Dedup, Sources, ZOrder}
import graft.operators.{DataMix, Graph, NearDup, Sampling, TextAnalysis}

/** The end-to-end training-data curation pipeline, composed purely from
  * the engine's operators — the "a user of the reference could run
  * their whole workflow here" demonstration, and the shape it would
  * keep on 100 TB (every stage is one of the already-scale-shaped
  * operators; no collects besides the final counts):
  *
  *   1. quality filter   — curationDecision reasons → keep
  *   1.5 span removal    — (optional) corpus-duplicated spans cut out
  *                         of surviving docs (q204's operator)
  *   2. exact dedup      — latest doc per normalized-content key
  *   3. near-dup dedup   — simhash pairs → connected components →
  *                         one canonical doc per cluster (or the
  *                         multimodal union of text/image/audio arms)
  *   3.5 embedding stage — (optional) prototype pruning + semantic
  *                         dedup over a doc-keyed vector table (the
  *                         q214 Sorscher composition)
  *   4. mixture sampling — deterministic per-source rates
  *   5. layout           — z-ordered parquet write (scan-efficient on
  *                         both doc_id and n_chars)
  *   6. planning         — leak-free train/val/test split (near-dup
  *                         clusters never straddle splits — the SAME
  *                         pair table stage 3 built) and the
  *                         per-(split × source) training manifest, the
  *                         artifact a training launcher consumes
  *
  * Returns per-stage row counts (the audit trail a production run
  * logs). `runMain graft.Pipeline [sfDir] [outDir]` prints them.
  */
object Pipeline {

  final case class StageCounts(input: Long, afterQuality: Long,
                               afterSpanRewrite: Long,
                               afterExact: Long, afterNearDup: Long,
                               afterMix: Long, manifestCells: Long,
                               afterEmbedding: Long = -1L)

  /** Stage-3.5 knobs for embedding-bearing corpora — the q214
    * composition (Sorscher prune-the-core, then SemDeDup the
    * survivors) wired into [[curate]]: documents whose vector is
    * pruned as prototypical or deduped as a semantic twin drop;
    * documents carrying no vector pass through untouched. Defaults
    * mirror the q205/q214 gate values. */
  final case class EmbedKnobs(k: Int = 8, iters: Int = 2,
                              keepBp: Int = 7000,
                              minCosine: Double = 0.45,
                              planes: Int = 5, tables: Int = 16,
                              bucketCap: Long = 32L) {
    require(k >= 1 && iters >= 0 && keepBp >= 1 && keepBp <= 10000,
      "degenerate prune shape")
    require(minCosine > 0 && minCosine <= 1, "cosine threshold in (0,1]")
  }

  /** Stage-1 quality profile. The round-4 signals (token floor,
    * stopword floor, repetition ceiling, lang match) are always on;
    * the round-9 corpus-relative signals gate behind their knobs:
    *
    *  - `dropPplBuckets` > 0 drops docs whose unigram-LM score lands
    *    in the lowest `dropPplBuckets` of `pplBuckets` corpus-relative
    *    buckets (the CCNet tail cut, q196's assignment); 0 = off.
    *  - `maxDupFrac` < 1 drops docs whose duplicated-substring
    *    fraction (q197's Lee-et-al positional metric over
    *    `dupSpanN`-grams) exceeds the ceiling; 1.0 = off.
    *
    * Both gates remove VIOLATORS by anti-join, so docs too short to
    * carry the signal (absent from the signal table) are never dropped
    * for missing it — the token floor already owns that case. The NB
    * source-confusion signal is source-level, not per-doc, so it feeds
    * the published scorecard (every signal's per-source average lands
    * there) rather than a keep/drop decision. */
  final case class QualityKnobs(minTokens: Long = 5,
                                minStopRatio: Double = 0.05,
                                maxRepRatio: Double = 0.6,
                                pplBuckets: Int = 10,
                                dropPplBuckets: Int = 0,
                                dupSpanN: Int = 5,
                                maxDupFrac: Double = 1.0,
                                nbBuckets: Int = 256,
                                nbSalt: String = "nb-v1",
                                spanDedupN: Int = 0,
                                spanDedupMinLen: Int = 0) {
    require(dropPplBuckets >= 0 && dropPplBuckets < pplBuckets,
      s"tail cut must leave at least one bucket: $dropPplBuckets/$pplBuckets")
    require(maxDupFrac > 0 && maxDupFrac <= 1.0,
      s"dup-span ceiling must be in (0, 1], got $maxDupFrac")
    require(spanDedupN == 0 || spanDedupN >= 2,
      s"span-removal width must be off (0) or a real span, got $spanDedupN")
    // spanDedupMinLen >= 1 switches stage 1.5 to the LENGTH-gated rule
    // (q213): only maximal merged spans of at least that many tokens
    // are cut — the threshold Lee et al. tune (50 on web corpora);
    // 0 keeps the fixed-width rule (every covered span, q204)
    require(spanDedupMinLen >= 0,
      s"span length gate must be off (0) or positive, got $spanDedupMinLen")
  }

  /** Stage 3's near-dup pair generator — exposed so the flood spec can
    * pin the PIPELINE's generator choice directly (a revert to the
    * uncapped band join would fail the spec's linear-volume bound, not
    * just slow a 100 TB run down by 40×). */
  private[graft] def nearDupPairs(docs: DataFrame): DataFrame =
    NearDup.simHashPairsCapped(NearDup.simHash(docs),
      maxHamming = DedupKnobs.SimHashMaxHamming,
      maxBucket = DedupKnobs.SimHashBucketCap)

  /** Stage 3's MULTIMODAL pair generator: the text simhash pairs
    * unioned with the image (q203 resampled-aHash) and audio (q217
    * multi-band fingerprint) dedup arms projected onto the document
    * graph — within-class star edges to each class representative
    * ([[graft.operators.Multimodal.classMemberEdges]]) plus the capped
    * class-pair tables' (anchor_a, anchor_b) representative edges. CC
    * over the union puts documents that duplicate under ANY modality
    * in one cluster, so a text-rewritten mirror of an image, or a
    * re-encoded recording, still collapses to one survivor. Every arm
    * is the already-flood-bounded generator its gate query runs; the
    * union adds no new fan-out. */
  private[graft] def multimodalPairs(spark: SparkSession,
                                     docs: DataFrame): DataFrame = {
    import graft.operators.Multimodal
    val text = nearDupPairs(docs).select(col("doc_a"), col("doc_b"))
    // both fingerprint arms project through the SATURATION-guarded
    // within-class stars (classMemberEdges doc): a class bigger than
    // the cap is birthday saturation of a small fingerprint space, not
    // a duplicate crowd — the unguarded projection collapsed the sf10
    // corpus (114,890 → 1) through 500-member audio fp classes and
    // 4,000-member image hash classes. The caps are the arms' existing
    // bucket caps: the same "bounded evidence per bucket" contract.
    val img = Multimodal.pHashesResampled(spark,
      Multimodal.pngPayloads(spark, docs), DedupKnobs.PHashGrid)
    val imgEdges = Multimodal.classMemberEdges(img, Seq("ph_hi", "ph_lo"),
        DedupKnobs.PHashClassBucketCap)
      .union(Multimodal.resampledClassPairsCapped(img,
          DedupKnobs.PHashMaxHamming, DedupKnobs.PHashClassBucketCap)
        .select(col("anchor_a").as("doc_a"), col("anchor_b").as("doc_b")))
    // the audio arm clusters on the MULTI-BAND fingerprint (q216/q217)
    // — the ≤31-bit envelope saturates at corpus scale (round 11's
    // percolation; q215 measures it), so identity on it is not
    // duplication evidence. The multi-band signal is wide enough that
    // the saturation cap below is a true anomaly guard, not the arm's
    // de-facto off switch.
    val aud = Multimodal.audioFingerprintsMultiBand(spark,
        Multimodal.wavPayloads(spark, docs),
        DedupKnobs.AudioFpSubWindows, DedupKnobs.AudioFpBands)
    val audEdges = Multimodal.classMemberEdges(aud, Seq("fp_hi", "fp_lo"),
        DedupKnobs.AudioClassBucketCap)
      .union(Multimodal.resampledClassPairsCapped(
          aud.select(col("doc_id"), col("fp_hi").as("ph_hi"),
            col("fp_lo").as("ph_lo")),
          DedupKnobs.AudioMbMaxHamming, DedupKnobs.AudioClassBucketCap)
        .select(col("anchor_a").as("doc_a"), col("anchor_b").as("doc_b")))
    text.union(imgEdges).union(audEdges)
  }

  /** @param checkpointDir reliable checkpoint location for the
    *        connected-components rounds inside near-dup dedup (stage
    *        3); None = executor-memory localCheckpoint, right for
    *        local mode — on a cluster pass a warehouse/HDFS path so a
    *        lost executor replays from storage (see Graph.cut). */
  /** @param multimodal stage 3 clusters over the UNION of the text,
    *        image and audio dedup arms ([[multimodalPairs]]) instead
    *        of text simhash alone — the knob for corpora whose
    *        documents carry image/audio payloads (here derived from
    *        doc_id, the deterministic-fake container story).
    * @param embeddings (vec_id keyed in the doc_id space, embedding)
    *        table for embedding-bearing corpora: enables stage 3.5 —
    *        prototype pruning + semantic dedup over the vectors (the
    *        q214 composition), dropping docs whose vector is pruned
    *        as prototypical or deduped as a semantic twin; docs
    *        without a vector pass through untouched. */
  /** The staged artifacts a curate() run lands that the NEXT
    * increment consumes (the whole-corpus tables an incremental run
    * must never recompute):
    *  - `exact`: the post-exact-dedup corpus (stage 2's output) — the
    *    key set batch exact-dedup anti-joins and the doc set batch
    *    near-dup compares against (the full rerun pairs over exact
    *    output, so this — not the final survivors — is the right
    *    comparison corpus);
    *  - `cells`: the manifest's additive census
    *    ([[graft.operators.DataMix.manifestCells]]) — increments merge
    *    by summing and re-derive the budget half;
    *  - `published`: the mixed documents the run actually shipped (what
    *    `outDir` receives) — the frame equivalence specs slice, and
    *    what a compaction pass reads when revocations accumulate. */
  final case class CorpusArtifacts(exact: DataFrame, cells: DataFrame,
                                   published: DataFrame)

  def curate(spark: SparkSession, docs: DataFrame,
             mixRates: Map[String, Double], mixSalt: String,
             outDir: Option[String],
             checkpointDir: Option[String] = None,
             knobs: QualityKnobs = QualityKnobs(),
             multimodal: Boolean = false,
             embeddings: Option[DataFrame] = None,
             embedKnobs: EmbedKnobs = EmbedKnobs()): StageCounts =
    curateWithArtifacts(spark, docs, mixRates, mixSalt, outDir,
      checkpointDir, knobs, multimodal, embeddings, embedKnobs)._1

  /** [[curate]] that ALSO returns the staged artifacts the next
    * [[curateIncrement]] consumes. The artifact frames are lazy views
    * over tables the run computed anyway — returning them costs
    * nothing unless a consumer scans them. */
  def curateWithArtifacts(spark: SparkSession, docs: DataFrame,
             mixRates: Map[String, Double], mixSalt: String,
             outDir: Option[String],
             checkpointDir: Option[String] = None,
             knobs: QualityKnobs = QualityKnobs(),
             multimodal: Boolean = false,
             embeddings: Option[DataFrame] = None,
             embedKnobs: EmbedKnobs = EmbedKnobs())
      : (StageCounts, CorpusArtifacts) = {
    // 1. quality: keep only docs passing every enabled signal — the
    // always-on round-4 reasons, then the corpus-relative perplexity
    // tail cut and the dup-span ceiling as violator ANTI-joins (see
    // QualityKnobs for why anti, not semi)
    val decisions = TextAnalysis.curationDecision(docs,
      TextAnalysis.stopwords("en"), minTokens = knobs.minTokens,
      minStopRatio = knobs.minStopRatio, maxRepRatio = knobs.maxRepRatio)
    var keepIds = decisions.filter(col("keep")).select(col("doc_id"))
    if (knobs.dropPplBuckets > 0)
      keepIds = keepIds.join(
        TextAnalysis.perplexityBucketOf(docs, knobs.pplBuckets)
          .filter(col("bucket") <= knobs.dropPplBuckets)
          .select(col("doc_id")),
        Seq("doc_id"), "left_anti")
    if (knobs.maxDupFrac < 1.0)
      keepIds = keepIds.join(
        TextAnalysis.dupSpanStats(docs, knobs.dupSpanN)
          .filter(col("dup_frac") > knobs.maxDupFrac)
          .select(col("doc_id")),
        Seq("doc_id"), "left_anti")
    // checkpointed: the frame is counted for the audit trail AND feeds
    // the dedup chain — unmaterialized, the 3-join decision stage (the
    // most expensive in the pipeline) would run once per consumer
    val quality = docs.join(keepIds, "doc_id").localCheckpoint()

    // 1.5 (optional, `spanDedupN` ≥ 2): duplicate-span REMOVAL — the
    // Lee et al. exact-substring dedup in its production form (q204):
    // instead of only DROPPING dup-heavy docs (the maxDupFrac gate),
    // REWRITE every surviving doc with its corpus-duplicated spans cut
    // out. Runs over the quality-pass corpus (duplication is defined
    // on what survives stage 1 — no compute spent on dropped docs) and
    // BEFORE exact dedup, so docs differing only in removed boilerplate
    // collapse to one normalized key in stage 2. Docs emptied by the
    // rewrite were pure corpus-duplicated boilerplate and are dropped
    // (the operator itself only rewrites; the drop is pipeline policy).
    val spanned =
      if (knobs.spanDedupN < 2) quality
      else quality
        .join((if (knobs.spanDedupMinLen >= 1)
            TextAnalysis.dedupSpansMinLen(quality, knobs.spanDedupN,
              knobs.spanDedupMinLen)
          else TextAnalysis.dedupSpans(quality, knobs.spanDedupN))
          .select(col("doc_id"), col("cleaned")), Seq("doc_id"))
        .withColumn("text", col("cleaned")).drop("cleaned")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .filter(col("n_chars") > 0)
        .localCheckpoint()

    // 2. exact dedup on the normalized content key (case/punct/space
    // insensitive); smallest doc_id is canonical
    // latestByKey keeps the max of orderBy; negating picks the SMALLEST
    // doc_id as canonical. Checkpointed: the frame feeds BOTH the
    // simhash pair pipeline and the survivors anti-join — without
    // materialization the whole upstream chain runs once per branch
    // (at 100 TB each stage would be a staging table instead).
    val exact = Dedup.latestByKey(
        spanned.withColumn("__key",
          md5(TextAnalysis.normalizeText(col("text")))),
        keys = Seq("__key"), orderBy = Seq(-col("doc_id")))
      .drop("__key")
      .localCheckpoint()

    // 3. near-dup dedup: transitive simhash clusters → survivors. The
    // cluster table is computed ONCE and checkpointed: it feeds both
    // the survivors anti-join here and stage 6's split groups — the
    // earlier dedupSurvivors + second connectedComponents form re-ran
    // the costliest computation in the pipeline (fingerprint → band
    // join → iterative CC) twice per curate().
    // CAPPED generator (q170's gated path), never the uncapped band
    // join: under band-bucket saturation the uncapped form is
    // O(bucket²) — 1465 s vs 34 s on the sf10 flood (SCALE.md round
    // 7) — and the flagship composition must survive exactly the
    // regime the containment family was hardened against. Below the
    // cap the pair set is identical (≡-exact spec), so fixture
    // clusters and survivors are unchanged; over it, flood buckets
    // star-reduce to their anchor, which keeps genuine duplicate
    // crowds connected (the CC only needs connectivity, not every
    // pairwise edge).
    val pairs =
      if (multimodal) multimodalPairs(spark, exact) else nearDupPairs(exact)
    val clusters = Graph.connectedComponents(pairs, "doc_a", "doc_b",
        checkpointDir = checkpointDir)
      .localCheckpoint()
    val dropIds = clusters.filter(col("n") =!= col("component"))
      .select(col("n"))
    val survivors = exact
      .join(dropIds, exact("doc_id") === dropIds("n"), "left_anti")
      .localCheckpoint()

    // 3.5 (optional, embedding-bearing corpora): the q214 composition
    // — prototype-prune the vector corpus (keep each fitted cluster's
    // hardest keepBp fraction, Sorscher et al.), then semantic-dedup
    // the pruned survivors (capped multi-table LSH pairs → CC). A doc
    // whose vector is pruned as prototypical or deduped as a semantic
    // twin drops; docs carrying no vector pass through — the vector
    // table governs only the docs it covers. Restricted to vectors of
    // SURVIVING docs first: no compute on docs already dropped.
    val embedded = embeddings match {
      case None => survivors
      case Some(embAll) =>
        val emb = embAll
          .join(survivors.select(col("doc_id").as("vec_id")), Seq("vec_id"))
          .localCheckpoint()
        val kept = graft.operators.KMeansQuantizer
          .prototypePruning(emb, embedKnobs.k, embedKnobs.iters,
            embedKnobs.keepBp)
          .filter(col("kept")).select(col("vec_id"))
        val keptEmb = emb.join(kept, Seq("vec_id")).localCheckpoint()
        val clusters = Graph.connectedComponents(
          graft.operators.Similarity.nearDupPairsLsh(keptEmb,
            embedKnobs.minCosine, embedKnobs.planes, embedKnobs.tables,
            embedKnobs.bucketCap),
          "vec_a", "vec_b", checkpointDir = checkpointDir)
        val dupVecs = clusters.filter(col("n") =!= col("component"))
          .select(col("n").as("vec_id"))
        val vecSurvivors = keptEmb.select(col("vec_id"))
          .join(dupVecs, Seq("vec_id"), "left_anti")
        val dropDocs = emb.select(col("vec_id"))
          .join(vecSurvivors, Seq("vec_id"), "left_anti")
          .select(col("vec_id").as("doc_id"))
        survivors.join(dropDocs, Seq("doc_id"), "left_anti")
          .localCheckpoint()
    }

    // 4. deterministic mixture
    val mixed = Sampling.deterministicMix(embedded, col("doc_id"),
      col("source"), mixRates, mixSalt)

    // 5. z-ordered layout (skip when no sink requested — tests count only)
    outDir.foreach { dir =>
      ZOrder.zOrderedWrite(mixed, col("doc_id"), col("n_chars"),
        bits = 16, path = dir)
    }

    // 6. planning: split the CURATED corpus leak-free (the SAME
    // cluster table stage 3 computed — a near-dup surviving the mix
    // can still have its dropped twin's split pinned by the shared
    // group) and roll up the training manifest. Checkpointed for the
    // same audit-count + sink double-consumption reason as the stages
    // above.
    // through the cells → allocation split (≡ trainManifest by
    // construction), so the additive census is available as the
    // increment artifact
    val cells = DataMix.manifestCells(mixed, clusters,
      mixSalt + "|split", trainBp = 8000, valBp = 9000)
    val manifest = DataMix.manifestFromCells(cells,
        budgetDen = 1, capEpochs = 2)
      .localCheckpoint()
    outDir.foreach { dir =>
      manifest.coalesce(1).write.mode("overwrite").parquet(dir + "_manifest")
      // the q200 quality scorecard over the CURATED corpus — the
      // per-source report published beside the manifest, so a training
      // launcher sees what quality the mix it consumes actually has
      // (|sources| rows; coalesce(1) is census-sized, not corpus-sized)
      TextAnalysis.qualityScorecard(mixed, TextAnalysis.stopwords("en"),
          knobs.dupSpanN, knobs.nbBuckets, knobs.nbSalt)
        .coalesce(1).write.mode("overwrite").parquet(dir + "_scorecard")
    }

    (StageCounts(docs.count(), quality.count(), spanned.count(),
      exact.count(), survivors.count(), mixed.count(), manifest.count(),
      afterEmbedding = if (embeddings.isDefined) embedded.count() else -1L),
      CorpusArtifacts(exact, cells, mixed))
  }

  final case class IncrementCounts(input: Long, afterQuality: Long,
                                   afterExact: Long, afterNearDup: Long,
                                   afterMix: Long, manifestCells: Long,
                                   revokedCorpusDocs: Long)

  /** Curate a NEW batch against yesterday's curated corpus WITHOUT
    * re-curating the corpus — the shape a real 100 TB ingestion runs
    * daily. Every whole-corpus table is a staged artifact of the prior
    * run, probed but never rebuilt:
    *
    *   1. quality    — the per-doc signals on the batch alone;
    *   2. exact      — batch keys anti-join the corpus post-exact key
    *                   set ([[CorpusArtifacts.exact]]), then the
    *                   within-batch latest-by-key;
    *   3. near-dup   — [[graft.operators.NearDup
    *                   .incrementalSimhashPairsCapped]] (the q70/q168
    *                   incremental shape on the pipeline's simhash
    *                   generator: batch-vs-corpus + batch-internal
    *                   pairs, union-exact caps) unioned with the
    *                   corpus's LANDED pair table, CC, canonical-min
    *                   survivors — a batch doc connected to any corpus
    *                   doc or smaller batch doc drops;
    *   4. mix        — the same pure-hash membership;
    *   5. manifest   — the batch's census cells MERGE into the corpus
    *                   cells by summation
    *                   ([[graft.operators.DataMix.mergeCells]]) and
    *                   the budget half re-derives from the merged
    *                   census — the latest-wins-by-key upsert shape of
    *                   [[graft.streaming.EventStream.upsertStreamToTable]]
    *                   with the merged row as the new version.
    *
    * EQUIVALENCE (spec-pinned): the batch survivor set equals the
    * batch slice of a full `curate(corpus ∪ batch)` rerun, and the
    * merged manifest equals the full rerun's manifest, PROVIDED
    * (a) every batch doc_id exceeds every corpus doc_id (checked
    * here — monotone ingest ids), (b) only per-doc quality signals
    * are on (corpus-relative knobs would be batch-relative: checked),
    * and (c) no batch doc BRIDGES two distinct corpus clusters — a
    * bridge means a previously published corpus survivor would lose
    * its canonical status in a full rerun. Bridged survivors are
    * DETECTED and reported (`revokedCorpusDocs`), never silently
    * retracted: published data is immutable in an incremental design,
    * and a production deployment routes revocations to a compaction
    * pass.
    *
    * Returns (batch mixed survivors, merged manifest, counts). */
  def curateIncrement(spark: SparkSession, corpus: CorpusArtifacts,
                      batch: DataFrame,
                      mixRates: Map[String, Double], mixSalt: String,
                      knobs: QualityKnobs = QualityKnobs(),
                      checkpointDir: Option[String] = None)
      : (DataFrame, DataFrame, IncrementCounts) = {
    require(knobs.dropPplBuckets == 0 && knobs.maxDupFrac >= 1.0 &&
      knobs.spanDedupN == 0,
      "corpus-relative quality stages (perplexity tail, dup-span gate, " +
        "span rewrite) are whole-corpus signals — run them in curate()")
    // id-ordering contract: the union anchor of any shared bucket must
    // be a corpus doc (see incrementalSimhashPairsCapped). Two census
    // aggs — not data-sized collects.
    val maxCorpusId = corpus.exact.agg(max(col("doc_id"))).head().getLong(0)
    val minBatchId = batch.agg(min(col("doc_id"))).head().getLong(0)
    require(minBatchId > maxCorpusId,
      s"batch ids must exceed corpus ids (monotone ingest): " +
        s"batch min $minBatchId <= corpus max $maxCorpusId")

    // 1. per-doc quality
    val decisions = TextAnalysis.curationDecision(batch,
      TextAnalysis.stopwords("en"), minTokens = knobs.minTokens,
      minStopRatio = knobs.minStopRatio, maxRepRatio = knobs.maxRepRatio)
    val quality = batch
      .join(decisions.filter(col("keep")).select(col("doc_id")), "doc_id")
      .localCheckpoint()

    // 2. exact: within-batch latest-by-key, then the corpus key set
    // anti-join (the corpus canonical always has the smaller id)
    def keyOf(df: DataFrame) =
      md5(TextAnalysis.normalizeText(df("text")))
    val corpusKeys = corpus.exact.select(keyOf(corpus.exact).as("__key"))
      .distinct()
    val exactB = Dedup.latestByKey(
        quality.withColumn("__key",
          md5(TextAnalysis.normalizeText(col("text")))),
        keys = Seq("__key"), orderBy = Seq(-col("doc_id")))
      .join(corpusKeys, Seq("__key"), "left_anti")
      .drop("__key")
      .localCheckpoint()

    // 3. near-dup: landed corpus artifacts (fingerprints, pair table —
    // plan-keyed staged, so in-process they build once per corpus and
    // a durable root lands them across runs) + the incremental pairs
    val corpusFps = graft.operators.Shingles.shared(
      NearDup.simHash(corpus.exact))
    val corpusPairs = graft.operators.Shingles.shared(
      NearDup.simHashPairsCapped(corpusFps,
          DedupKnobs.SimHashMaxHamming, DedupKnobs.SimHashBucketCap)
        .select(col("doc_a"), col("doc_b")))
    val incPairs = NearDup.incrementalSimhashPairsCapped(corpusFps,
        NearDup.simHash(exactB),
        DedupKnobs.SimHashMaxHamming, DedupKnobs.SimHashBucketCap)
      .select(col("doc_a"), col("doc_b"))
    val merged = Graph.connectedComponents(corpusPairs.union(incPairs),
        "doc_a", "doc_b", checkpointDir = checkpointDir)
      .localCheckpoint()
    val dropIds = merged.filter(col("n") =!= col("component"))
      .select(col("n"))
    val survivors = exactB
      .join(dropIds, exactB("doc_id") === dropIds("n"), "left_anti")
      .localCheckpoint()
    // revocation audit: previously-published corpus survivors whose
    // canonical status a full rerun would revoke (a batch doc bridged
    // their cluster to a smaller-min one)
    val corpusCC = Graph.connectedComponents(corpusPairs,
      "doc_a", "doc_b", checkpointDir = checkpointDir)
    val corpusSurvivorIds = corpus.exact.select(col("doc_id"))
      .join(corpusCC.filter(col("n") =!= col("component"))
          .select(col("n").as("doc_id")),
        Seq("doc_id"), "left_anti")
    val revoked = corpusSurvivorIds
      .join(dropIds.select(col("n").as("doc_id")), Seq("doc_id"))
      .count()

    // 4. mix
    val mixed = Sampling.deterministicMix(survivors, col("doc_id"),
      col("source"), mixRates, mixSalt)

    // 5. manifest: sum-merge the batch's cells into the corpus cells,
    // re-derive the budget half from the merged census
    val deltaCells = DataMix.manifestCells(mixed, merged,
      mixSalt + "|split", trainBp = 8000, valBp = 9000)
    val manifest = DataMix.manifestFromCells(
        DataMix.mergeCells(corpus.cells, deltaCells),
        budgetDen = 1, capEpochs = 2)
      .localCheckpoint()

    (mixed, manifest,
      IncrementCounts(batch.count(), quality.count(), exactB.count(),
        survivors.count(), mixed.count(), manifest.count(), revoked))
  }

  def main(args: Array[String]): Unit = {
    // "multimodal" anywhere in args turns on the stage-3 union of the
    // text/image/audio dedup arms; the POSITIONAL args are what's left
    // (so `runMain graft.Pipeline multimodal` keeps the default sfDir
    // instead of reading the flag as a corpus path); a literal "-" out
    // dir means none
    val multimodal = args.contains("multimodal")
    val pos = args.filterNot(_ == "multimodal")
    val sfDir = pos.headOption.getOrElse("/root/testdata/sf0.001")
    val out = pos.drop(1).headOption.filter(_ != "-")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rates = Map("src1" -> 1.0, "src2" -> 1.0, "src3" -> 0.5,
      "src5" -> 0.8, "src7" -> 1.0, "src11" -> 0.25)
    // the production profile turns the round-9 signals ON — cut the
    // lowest perplexity decile (CCNet tail), cap the duplicated-
    // substring fraction — and the round-10 span REWRITE (q204's
    // operator): surviving docs lose their corpus-duplicated 5-grams
    // before exact dedup
    val c = curate(spark, Sources.table(spark, sfDir, "documents"),
      rates, "pipeline-v1", out,
      knobs = QualityKnobs(dropPplBuckets = 1, maxDupFrac = 0.9,
        spanDedupN = 5),
      multimodal = multimodal)
    println(s"""{"input":${c.input},"quality":${c.afterQuality},""" +
      s""""span_rewrite":${c.afterSpanRewrite},""" +
      s""""exact":${c.afterExact},"neardup":${c.afterNearDup},""" +
      s""""mixed":${c.afterMix},"manifest_cells":${c.manifestCells}}""")
    spark.stop()
  }
}
