package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Graph, Similarity}

/** Measures the multi-table LSH embedding near-dup generator
  * ([[Similarity.nearDupPairsLsh]]) and its downstream semantic-dedup
  * clustering at PRODUCTION-shaped parameters — the SCALE.md evidence
  * for q179/q180's design.
  *
  * Why a separate probe: the q179 gate constants (5 planes × 16 tables,
  * cap 32) are sized for the 500-vector gate fixtures. Hyperplane LSH's
  * bucket count is 2^planes — structurally UNLIKE the simhash band
  * family, whose 16-bit band space absorbs corpus growth on its own —
  * so `planes` is the knob a production deployment grows with corpus
  * size (planes ≈ log2(n / target_bucket)). This probe runs the same
  * operator at caller-chosen parameters over a large fixture and prints
  * wall time, candidate volume, verified-pair and cluster counts: the
  * numbers that show the operator's cost is bucket-population-bounded,
  * not n².
  *
  * Usage: `runMain graft.tools.EmbLshBench [sfDir] [planes] [tables]
  * [cap] [minCosine]` — defaults target the sf10 fixtures at
  * production shape (16 planes × 16 tables, cap 128).
  */
object EmbLshBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val planes = args.lift(1).map(_.toInt).getOrElse(16)
    val tables = args.lift(2).map(_.toInt).getOrElse(16)
    val cap = args.lift(3).map(_.toLong).getOrElse(128L)
    val minCos = args.lift(4).map(_.toDouble).getOrElse(0.45)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.engine.Sources.table(spark, sfDir, "embeddings")
    val nVec = emb.count()
    println(s"[emblsh] corpus $nVec vectors; planes=$planes tables=$tables " +
      s"cap=$cap minCosine=$minCos")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[emblsh] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val pairs = timed("capped pair build (band → distinct candidates → verify)") {
      val p = Similarity.nearDupPairsLsh(emb, minCos, planes, tables, cap)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      println(s"[emblsh] verified pairs: ${p.count()}")
      p
    }
    timed("connected components over the verified pairs") {
      val cc = Graph.connectedComponents(pairs, "vec_a", "vec_b")
      val agg = cc.agg(count(lit(1)).as("n_nodes"),
        countDistinct(col("component")).as("n_clusters")).head()
      println(s"[emblsh] clustered nodes: ${agg.getLong(0)}, " +
        s"clusters: ${agg.getLong(1)}, " +
        s"survivors: ${nVec - agg.getLong(0) + agg.getLong(1)}")
    }
    spark.stop()
  }
}
