package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the salted-join skew guard ([[graft.engine.Joins.saltedJoin]])
  * against the plain shuffle join on the SAME deliberately skewed build —
  * the SCALE.md design argument, now with a number attached.
  *
  * The skewed input: sf1 lineitem (6M rows) with a synthetic join key
  * where ~50% of rows share ONE hot key and the rest spread uniformly
  * over 100k keys — skew factor ≈ 100,000× the median key's population.
  * The dim side carries one row per key; the broadcast threshold is
  * disabled so every variant pays a genuine shuffle join (the regime
  * where skew matters — with a broadcastable dim there is no skew
  * problem to solve). Three variants over identical data, identical
  * results:
  *
  *  - `plain/noAQE`   — naive shuffle join, adaptive execution off: one
  *                      straggler task sorts+joins half the fact table.
  *  - `plain/AQE`     — Spark's runtime skew-split
  *                      (spark.sql.adaptive.skewJoin), the first-line
  *                      production guard.
  *  - `salted/AQE`    — compile-time salting (32 buckets): the guard
  *                      for plans AQE cannot split (skewed side pinned
  *                      to a partitioning a downstream stage reuses, or
  *                      non-sort-merge physical plans).
  *
  * Prints one line per variant (min of 2 after a warm-up pass, the
  * Bench.scala discipline) plus the measured skew factor.
  *
  * Usage: `runMain graft.tools.SkewBench [sfDir]` (defaults to the sf1
  * fixtures).
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // force genuine shuffle joins: a broadcastable dim would erase
      // the skew problem the measurement exists to show
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nKeys = 100000L
    def skewedFact(s: SparkSession): DataFrame =
      graft.engine.Sources.table(s, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"),
          // ~50% of rows on key 0, the rest uniform over nKeys
          when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(2)) === 0,
            lit(0L))
            .otherwise(pmod(xxhash64(col("l_partkey"), lit("spread")), lit(nKeys)))
            .as("k"))
    def dim(s: SparkSession): DataFrame =
      s.range(nKeys).select(col("id").as("k"),
        (col("id") % 97).cast("double").as("weight"))

    val fact = skewedFact(spark)
    val hot = fact.groupBy(col("k")).count()
      .agg(max(col("count")).as("mx"),
        expr("percentile_approx(count, 0.5)").as("med"))
      .collect()(0)
    println(s"[skewbench] rows=${fact.count()} hot=${hot.get(0)} " +
      s"median_key=${hot.get(1)} skew_factor=" +
      s"${hot.getLong(0) / math.max(1L, hot.getLong(1))}")

    def joined(salted: Boolean): DataFrame = {
      val j =
        if (salted)
          graft.engine.Joins.saltedJoin(skewedFact(spark), dim(spark), "k",
            saltBuckets = 32, saltSource = col("l_orderkey"))
        else skewedFact(spark).join(dim(spark), Seq("k"))
      j.groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity") * col("weight")).as("wq"))
    }

    def time(label: String, salted: Boolean, aqe: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      def pass(): Double = {
        val t0 = System.nanoTime()
        joined(salted).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      pass() // warm-up
      val t = math.min(pass(), pass())
      println(f"[skewbench] $label%-12s $t%.2f s")
    }

    time("plain/noAQE", salted = false, aqe = false)
    time("plain/AQE", salted = false, aqe = true)
    time("salted/AQE", salted = true, aqe = true)
    spark.stop()
  }
}
