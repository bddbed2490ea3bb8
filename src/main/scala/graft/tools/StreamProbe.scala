package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** q178 cost-split probe (round-12 verdict item): run the online
  * near-dup stream once at the given SF and report WHERE the wall time
  * goes — micro-batch count, per-batch durations (triggerExecution,
  * addBatch, getBatch, walCommit, stateManagement), rows and state
  * metrics — so "trigger-bound vs state-bound" is a measurement, not a
  * guess.
  *
  *   runMain graft.tools.StreamProbe [sfDir]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "134217728"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
        progress.add(e.progress.json)
    })
    val t0 = System.nanoTime()
    val out = graft.streaming.NearDupStream.runOnlineDedupOnce(spark, sfDir,
      graft.DedupKnobs.SimHashMaxHamming,
      graft.DedupKnobs.SimHashBucketCap.toInt)
    val n = out.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[streamprobe] sf=$sfDir wall=$wall%.1f s verdict_rows=$n")
    import scala.jdk.CollectionConverters._
    progress.asScala.foreach(p => println(s"[progress] $p"))
    spark.stop()
  }
}
