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
  *   2. exact dedup      — latest doc per normalized-content key
  *   3. near-dup dedup   — simhash pairs → connected components →
  *                         one canonical doc per cluster
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
                               afterExact: Long, afterNearDup: Long,
                               afterMix: Long, manifestCells: Long)

  /** @param checkpointDir reliable checkpoint location for the
    *        connected-components rounds inside near-dup dedup (stage
    *        3); None = executor-memory localCheckpoint, right for
    *        local mode — on a cluster pass a warehouse/HDFS path so a
    *        lost executor replays from storage (see Graph.cut). */
  def curate(spark: SparkSession, docs: DataFrame,
             mixRates: Map[String, Double], mixSalt: String,
             outDir: Option[String],
             checkpointDir: Option[String] = None): StageCounts = {
    // 1. quality: keep only docs passing every signal
    val decisions = TextAnalysis.curationDecision(docs,
      TextAnalysis.stopwords("en"),
      minTokens = 5, minStopRatio = 0.05, maxRepRatio = 0.6)
    // checkpointed: the frame is counted for the audit trail AND feeds
    // the dedup chain — unmaterialized, the 3-join decision stage (the
    // most expensive in the pipeline) would run once per consumer
    val quality = docs.join(
        decisions.filter(col("keep")).select(col("doc_id")), "doc_id")
      .localCheckpoint()

    // 2. exact dedup on the normalized content key (case/punct/space
    // insensitive); smallest doc_id is canonical
    // latestByKey keeps the max of orderBy; negating picks the SMALLEST
    // doc_id as canonical. Checkpointed: the frame feeds BOTH the
    // simhash pair pipeline and the survivors anti-join — without
    // materialization the whole upstream chain runs once per branch
    // (at 100 TB each stage would be a staging table instead).
    val exact = Dedup.latestByKey(
        quality.withColumn("__key",
          md5(TextAnalysis.normalizeText(col("text")))),
        keys = Seq("__key"), orderBy = Seq(-col("doc_id")))
      .drop("__key")
      .localCheckpoint()

    // 3. near-dup dedup: transitive simhash clusters → survivors. The
    // cluster table is computed ONCE and checkpointed: it feeds both
    // the survivors anti-join here and stage 6's split groups — the
    // earlier dedupSurvivors + second connectedComponents form re-ran
    // the costliest computation in the pipeline (fingerprint → band
    // join → iterative CC) twice per curate()
    val pairs = NearDup.simHashPairs(NearDup.simHash(exact),
      maxHamming = DedupKnobs.SimHashMaxHamming)
    val clusters = Graph.connectedComponents(pairs, "doc_a", "doc_b",
        checkpointDir = checkpointDir)
      .localCheckpoint()
    val dropIds = clusters.filter(col("n") =!= col("component"))
      .select(col("n"))
    val survivors = exact
      .join(dropIds, exact("doc_id") === dropIds("n"), "left_anti")
      .localCheckpoint()

    // 4. deterministic mixture
    val mixed = Sampling.deterministicMix(survivors, col("doc_id"),
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
    val manifest = DataMix.trainManifest(mixed, clusters,
        mixSalt + "|split", trainBp = 8000, valBp = 9000,
        budgetDen = 1, capEpochs = 2)
      .localCheckpoint()
    outDir.foreach { dir =>
      manifest.coalesce(1).write.mode("overwrite").parquet(dir + "_manifest")
    }

    StageCounts(docs.count(), quality.count(), exact.count(),
      survivors.count(), mixed.count(), manifest.count())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions).master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rates = Map("src1" -> 1.0, "src2" -> 1.0, "src3" -> 0.5,
      "src5" -> 0.8, "src7" -> 1.0, "src11" -> 0.25)
    val c = curate(spark, Sources.table(spark, sfDir, "documents"),
      rates, "pipeline-v1", out)
    println(s"""{"input":${c.input},"quality":${c.afterQuality},""" +
      s""""exact":${c.afterExact},"neardup":${c.afterNearDup},""" +
      s""""mixed":${c.afterMix},"manifest_cells":${c.manifestCells}}""")
    spark.stop()
  }
}
