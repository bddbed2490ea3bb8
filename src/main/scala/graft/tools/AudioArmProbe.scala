package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DedupKnobs
import graft.operators.{Graph, Multimodal, NearDup}

/** Round-12 done-criterion probe: does the AUDIO arm of the multimodal
  * dedup union remove documents the other arms don't? Runs the
  * pipeline's stage-3 pair construction over the exact-dedup survivors
  * at the given SF three ways — text-only, text+image, and
  * text+image+audio (the multiband arm `Pipeline.curate` uses) — and
  * reports near-dup survivor counts, so "the audio arm contributes
  * verified removals (not quarantined)" is a measured number.
  *
  *   runMain graft.tools.AudioArmProbe [sfDir]
  */
object AudioArmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.engine.Sources.table(spark, sfDir, "documents")
    // the pipeline's stage 1+2 (quality profile of Pipeline.main, span
    // rewrite off so the probe isolates stage 3's arms)
    val decisions = graft.operators.TextAnalysis.curationDecision(docs,
      graft.operators.TextAnalysis.stopwords("en"),
      minTokens = 5, minStopRatio = 0.10, maxRepRatio = 0.5)
    val quality = docs
      .join(decisions.filter(col("keep")).select(col("doc_id")), "doc_id")
      .localCheckpoint()
    val exact = graft.engine.Dedup.latestByKey(
        quality.withColumn("__key",
          md5(graft.operators.TextAnalysis.normalizeText(col("text")))),
        keys = Seq("__key"), orderBy = Seq(-col("doc_id")))
      .drop("__key").localCheckpoint()
    val nExact = exact.count()

    val text = graft.Pipeline.nearDupPairs(exact)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    val img = Multimodal.pHashesResampled(spark,
      Multimodal.pngPayloads(spark, exact), DedupKnobs.PHashGrid)
    val imgEdges = Multimodal.classMemberEdges(img, Seq("ph_hi", "ph_lo"),
        DedupKnobs.PHashClassBucketCap)
      .union(Multimodal.resampledClassPairsCapped(img,
          DedupKnobs.PHashMaxHamming, DedupKnobs.PHashClassBucketCap)
        .select(col("anchor_a").as("doc_a"), col("anchor_b").as("doc_b")))
      .localCheckpoint()
    val aud = Multimodal.audioFingerprintsMultiBand(spark,
      Multimodal.wavPayloads(spark, exact),
      DedupKnobs.AudioFpSubWindows, DedupKnobs.AudioFpBands)
    val audEdges = Multimodal.classMemberEdges(aud, Seq("fp_hi", "fp_lo"),
        DedupKnobs.AudioClassBucketCap)
      .union(Multimodal.resampledClassPairsCapped(
          aud.select(col("doc_id"), col("fp_hi").as("ph_hi"),
            col("fp_lo").as("ph_lo")),
          DedupKnobs.AudioMbMaxHamming, DedupKnobs.AudioClassBucketCap)
        .select(col("anchor_a").as("doc_a"), col("anchor_b").as("doc_b")))
      .localCheckpoint()

    def survivors(pairs: DataFrame): Long = {
      val cc = Graph.connectedComponents(pairs, "doc_a", "doc_b")
      nExact - cc.filter(col("n") =!= col("component")).count()
    }
    val sText = survivors(text)
    val sTi = survivors(text.union(imgEdges))
    val sTia = survivors(text.union(imgEdges).union(audEdges))
    println(s"""{"sf":"$sfDir","exact":$nExact,"survivors_text":$sText,""" +
      s""""survivors_text_image":$sTi,"survivors_multimodal":$sTia,""" +
      s""""audio_arm_removals":${sTi - sTia},""" +
      s""""image_arm_removals":${sText - sTi},""" +
      s""""audio_edge_rows":${audEdges.count()}}""")
    spark.stop()
  }
}
