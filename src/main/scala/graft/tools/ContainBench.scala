package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the containment family's two exact candidate plans —
  * straight postings self-join vs PPJoin prefix filter — under the
  * corpus-relative df band, at the given SF dir. The round-3 numbers
  * (postings 2.2 s vs prefix 8 s at sf0.1) predate the band: with the
  * fan-out budget keeping only rare shingles at saturation (df ≈ 800
  * at sf10), the crossover needed re-measuring so the "prefix for
  * df-skewed corpora" guidance in [[graft.operators.NearDup]] is a
  * measured rule, not an extrapolation.
  *
  * Usage: `runMain graft.tools.ContainBench [sfDir] [reps]`. Executes
  * the FULL plan via the noop sink (Bench.scala discipline), min-of-N.
  */
object ContainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.engine.Sources.table(spark, sfDir, "documents")
    for (prefix <- Seq(false, true)) {
      def run(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.operators.NearDup.containmentPairsQuantileBand(docs,
            graft.DedupKnobs.MinContainment,
            graft.DedupKnobs.ShingleDfQuantileBp,
            graft.DedupKnobs.ShingleDfFloor,
            graft.DedupKnobs.ShingleDfFanoutBudget,
            prefixFilter = prefix)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm: stages the shingle/postings tables + codegen
      val t = (1 to reps).map(_ => run()).min
      println(f"""{"prefixFilter":$prefix,"sec":$t%.2f,"sf_dir":"$sfDir"}""")
    }
    spark.stop()
  }
}
