package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.EventStream

/** Measures the three streaming runners (windowed agg, stateful dedup,
  * keyed exact moments) under the default (HDFS-backed, on-heap) state
  * store vs RocksDB — the off-heap, spillable store a 100 TB deployment
  * assumes (SCALE.md): on-heap stores hold every key's state in
  * executor memory, which caps keyed-state cardinality; RocksDB spills
  * to local disk and bounds memory regardless of key count.
  *
  * Local[8] over the bench fixtures the two differ only by per-batch
  * commit overhead (the fixture key cardinality fits either store) —
  * the point of the measurement is that the RocksDB numbers stay in
  * the same band, proving the 100 TB configuration is NOT a local
  * regression. Prints one line per (provider, runner): min-of-2 after
  * a warm-up pass, the Bench.scala discipline.
  *
  * Usage: `runMain graft.tools.StreamStoreBench [sfDir]`.
  */
object StreamStoreBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val providers = Seq(
      "default" -> None,
      "rocksdb" -> Some("org.apache.spark.sql.execution.streaming.state" +
        ".RocksDBStateStoreProvider"))
    val results = for ((label, cls) <- providers) yield {
      val sess = spark.newSession()
      cls.foreach(c =>
        sess.conf.set("spark.sql.streaming.stateStore.providerClass", c))
      val runners = Seq[(String, () => Unit)](
        "hourly_agg" -> (() => { EventStream.runHourlyOnce(sess, sfDir).count(); () }),
        "stateful_dedup" -> (() => { EventStream.runDedupOnce(sess, sfDir).count(); () }),
        "keyed_moments" -> (() => { EventStream.runUserStatsExactOnce(sess, sfDir).count(); () }),
        // the two document-stream gates (q178 online near-dup, q190
        // stream-scored DSIR): their peak state rows are the SCALE.md
        // bounded-state measurements
        "online_neardup_q178" -> (() => {
          graft.streaming.NearDupStream.runOnlineDedupOnce(sess, sfDir,
            graft.DedupKnobs.SimHashMaxHamming,
            graft.DedupKnobs.SimHashBucketCap.toInt).count(); () }),
        "stream_dsir_q190" -> (() => {
          EventStream.runDsirScoreOnce(sess, sfDir,
            org.apache.spark.sql.functions.col("source") ===
              graft.SparkEntry.DsirTargetSource,
            graft.SparkEntry.DsirBuckets,
            graft.SparkEntry.DsirSalt).count(); () }))
      // SPARK_GRAFT_SSB_ONLY: comma list to restrict runners — the sf10
      // campaign measures the two document-stream gates alone (the
      // event runners' sf10 state is a separate, heavier measurement).
      // Unknown names fail loudly: a typo would otherwise filter the
      // runner list to empty and the campaign would "succeed" with no
      // output at all.
      val ssbOnly = sys.env.get("SPARK_GRAFT_SSB_ONLY").map(_.split(",").toSet)
      ssbOnly.foreach { only =>
        val known = runners.map(_._1).toSet
        val unknown = only.diff(known)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_SSB_ONLY names no runner: ${unknown.mkString(",")}" +
            s" (known: ${known.toSeq.sorted.mkString(",")})")
      }
      runners.filter { case (n, _) => ssbOnly.forall(_.contains(n)) }
        .map { case (name, run) =>
        run() // warm: codegen + sink plumbing
        def pass(): Double = {
          val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
        }
        // reset-to-sentinel before the measured passes: only runToMemory
        // updates the global, so a runner routed elsewhere (foreachBatch
        // upsert forms) must report -1 "not measured", never the
        // PREVIOUS runner's stale peak
        EventStream.lastRunPeakStateRows = -1L
        val t = math.min(pass(), pass())
        val stateRows = EventStream.lastRunPeakStateRows
        println(f"""{"provider":"$label","runner":"$name","sec":$t%.3f,"peak_state_rows":$stateRows}""")
        (label, name, t)
      }
    }
    val flat = results.flatten
    println("summary: " + flat.map { case (p, n, t) => s"$p/$n=${f"$t%.2f"}" }
      .mkString(" "))
    spark.stop()
  }
}
