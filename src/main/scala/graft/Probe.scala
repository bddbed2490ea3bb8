package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe: time declared queries at the given SF dir.
  *
  * Usage: runMain graft.Probe [sfDir] [q1,q2,...] [reps]
  *
  * Executes the FULL plan via the noop sink (count() lets Catalyst prune
  * windows/sorts and under-measures) and reports the minimum over `reps`
  * runs — the box runs other tenants, so min-of-N is the stable signal.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val only = if (args.length > 1 && args(1).nonEmpty)
      args(1).split(",").toSet else Set.empty[String]
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session so per-query numbers aren't polluted by JVM startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        val times = (1 to reps).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          fn(spark, dir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name%-28s min=${times.min}%6.2f s  runs=[${times.map(t => f"$t%.2f").mkString(", ")}]")
      }
    }
    spark.stop()
  }
}
