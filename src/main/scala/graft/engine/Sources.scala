package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Typed scans over the driver fixtures (`TESTDATA.md`, `FIXTURES.md`).
  *
  * Schemas are explicit, not inferred: at 100 TB a scan must not pay
  * file-footer sampling or schema merge, and a pinned `StructType` gives
  * Catalyst exact types/nullability for pruning and pushdown. This replaces
  * the reference's schema-inferring Mongo connector scan
  * (reference: src/processing/mongo_avg_laptime_by_driver.py:30).
  */
object Sources {

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  /** `ts` is parquet TIMESTAMP(MICROS) stored as physical INT64; pinning
    * LONG here reads the raw micros-since-epoch integer, which the exact
    * time arithmetic throughout the catalog (gaps, intervals, sessions)
    * operates on directly. [[table]] adds the derived `ts_utc`
    * TimestampType column (`timestamp_micros(ts)`). NOTE: earlier
    * fixture generations wrote TIMESTAMP(NANOS); such a file now FAILS
    * at scan (no nanosAsLong legacy conf anywhere — see the note above
    * [[table]]) instead of silently reading ns values into µs math. */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "lineitem" -> lineitem, "orders" -> orders, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "nation" -> nation,
    "region" -> region, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)

  /** Idempotent keyed write — the engine analog of the reference's
    * unique-index + bulk-upsert ingest (reference:
    * src/ingest/ingest_laps.py:57-68): dedup to the latest row per key,
    * then overwrite the target. Re-running the same ingest produces an
    * identical table (re-run ≡ upsert). At scale the target would be
    * partitioned (`partitionBy`) so an incremental run only rewrites the
    * affected partitions. */
  def idempotentWrite(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
                      versionCol: String, path: String,
                      partitionCols: Seq[String] = Nil): Unit = {
    val deduped = Dedup.latestByKey(df, keys,
      Seq(org.apache.spark.sql.functions.col(versionCol)))
    val w = deduped.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Hive-style partitioned layout (`path/col=value/...`) — the 100 TB
    * table layout: a predicate on a partition column prunes directories
    * at PLANNING time (`PartitionFilters` in the scan, zero I/O for
    * pruned partitions), independent of parquet row-group stats. Choose
    * partition columns with bounded cardinality (day, region), never
    * high-cardinality keys — 10⁶ tiny directories is its own failure
    * mode. Combine with `spark.sql.files.maxPartitionBytes` so each
    * task reads ~128 MB. */
  def partitionedWrite(df: org.apache.spark.sql.DataFrame,
                       partitionCols: Seq[String], path: String): Unit =
    df.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)

  /** Schema-pinned JSON-Lines scan — the interchange format of
    * training-data pipelines (one JSON doc per line, splittable, so a
    * 100 TB corpus parallelizes by byte range like any text source).
    * The explicit schema avoids Spark's whole-file inference pass AND
    * pins column types against heterogeneous lines; corrupt lines land
    * in `_corrupt_record` when `keepCorrupt` (PERMISSIVE) instead of
    * failing the job, the right default for web-scale scrapes. (Spark
    * disallows queries that touch ONLY `_corrupt_record` on the raw
    * scan — cache() the frame before corrupt-rate audits.) */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
                keepCorrupt: Boolean = false): DataFrame = {
    val s = if (keepCorrupt)
      StructType(schema.fields :+ StructField("_corrupt_record", StringType))
    else schema
    spark.read.schema(s)
      .option("mode", if (keepCorrupt) "PERMISSIVE" else "FAILFAST")
      .json(path)
  }

  /** JSON-Lines writer (one doc per line, gzip-friendly, splittable
    * when uncompressed). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Schema-pinned CSV scan. Same explicit-schema rationale as
    * [[readJsonl]]; timestamps parse with the given pattern. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "FAILFAST")
      .csv(path)

  /** CSV writer, header included. */
  def writeCsv(df: DataFrame, path: String, delimiter: String = ","): Unit =
    df.write.mode("overwrite")
      .option("header", "true").option("delimiter", delimiter)
      .csv(path)

  /** Schema-pinned ORC scan — the second columnar format (both ship in
    * Spark; ORC carries its own footer schema exactly like parquet, so
    * the pinned StructType plays the same fail-loud role). */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC writer (zlib default; splittable stripes). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Register every fixture table as a temp view so the WHOLE engine is
    * reachable through pure `spark.sql(...)` — the injected functions
    * (graft_dot, graft_nfc) already are via [[graft.GraftExtensions]],
    * and views close the gap for users who never touch the DataFrame
    * API. Views are lazy: registering costs nothing until queried. */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    schemas.keys.foreach { name =>
      table(spark, sfDir, name).createOrReplaceTempView(name)
    }

  /** Small-file compaction — the standing operational task of any
    * long-lived 100 TB table (streaming sinks and per-partition upserts
    * accrete kilobyte files; scan cost then scales with FILE COUNT, not
    * bytes: each file is a task + a footer read + an open). Rewrites a
    * parquet directory into ⌈rows / rowsPerFile⌉ similar-sized files
    * via a round-robin repartition (no shuffle key — pure rebalance),
    * staging into `path + ".compact"` first and swapping only after the
    * write succeeds, so a failed compaction leaves the table intact.
    * At cluster scale run per partition directory, gated on file-count
    * thresholds. */
  def compact(spark: SparkSession, path: String, rowsPerFile: Long): Unit = {
    require(rowsPerFile > 0, "rowsPerFile must be positive")
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile).toInt
    val staging = path.stripSuffix("/") + ".compact"
    df.repartition(files).write.mode("overwrite").parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(staging), spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + ".old")
    // move-aside, not delete-then-rename: at every instant the rows
    // exist under a well-known name, and each step is checked. A crash
    // between the two renames leaves `.old` (and possibly `.compact`)
    // to recover from — never a silently vanished table.
    if (fs.exists(old)) require(fs.delete(old, true),
      s"cannot clear stale $old")
    require(fs.rename(target, old), s"cannot move $path aside to $old")
    require(fs.rename(new org.apache.hadoop.fs.Path(staging), target),
      s"compaction swap failed for $path — original preserved at $old")
    require(fs.delete(old, true), s"compaction done but cannot remove $old")
  }

  /** NOTE on the TIMESTAMP(NANOS) fixture era (rounds 1-3): the repo
    * used `spark.sql.legacy.parquet.nanosAsLong=true` to read ns-typed
    * columns as since-epoch LONGs. That conf is deliberately GONE now:
    * with it set, a stale ns fixture would scan successfully and
    * `timestamp_micros(ts)` would be silently wrong by 1000×. Without
    * it, Spark rejects a TIMESTAMP(NANOS) column outright ("Illegal
    * Parquet type") — the fail-loud behavior a fixture-unit drift
    * deserves. TIMESTAMP(MICROS) INT64 reads as a pinned LONG with no
    * conf at all. */

  /** Scan one fixture table with its pinned schema. For `events`, reads
    * the micros timestamp as its raw LONG and derives `ts_utc: timestamp`.
    */
  /** ONE definition of the micros-long → timestamp derivation, shared by
    * the pinned and inferred read paths — drift between the two would
    * silently break their drop-in interchangeability. The pinned path
    * reads `ts` as LONG µs; the inferred path gets whatever the footer
    * declares (TIMESTAMP_NTZ for the µs fixtures), so it is normalized
    * back to the same (`ts`: LONG µs, `ts_utc`: timestamp) shape — all
    * harness sessions run in UTC, making the NTZ→instant cast exact. */
  private def deriveTsUtc(df: DataFrame): DataFrame =
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts_utc",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts)"))
      case _ =>
        import org.apache.spark.sql.functions.{col, unix_micros}
        val utc = col("ts").cast(org.apache.spark.sql.types.TimestampType)
        df.withColumn("ts_utc", utc).withColumn("ts", unix_micros(utc))
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
    if (name == "events") deriveTsUtc(df) else df
  }

  /** (fileBytes, rowGroups) per parquet file, from one driver-side
    * footer read — cached on (path, len, mtime) so a regenerated
    * fixture re-probes and an unchanged one never re-reads. */
  private val footerCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), (Long, Int)]()

  private def parquetLayout(spark: SparkSession, path: String): (Long, Int) = {
    val hconf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val st = p.getFileSystem(hconf).getFileStatus(p)
    footerCache.computeIfAbsent((path, st.getLen, st.getModificationTime), _ => {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, hconf))
      try (st.getLen, r.getFooter.getBlocks.size)
      finally r.close()
    })
  }

  /** [[table]] with a guarded parallelizing repartition for UNDER-SPLIT
    * scans — the guide-§2.5 "one huge unsplittable file" fix. Spark can
    * split a parquet FILE by byte ranges, but a ROW GROUP is consumed
    * whole by the split holding its start, so a single-row-group file
    * (the fixture layout at every SF, and any production table landed
    * by a writer with oversized row groups) caps the scan stage — and
    * with it everything fused into the scan's WholeStageCodegen span
    * (join probes, exact-decimal partial aggregation) — at ONE task no
    * matter how many cores the session has.
    *
    * The fix moves the bytes exactly once: a deterministic hash
    * repartition on the table's id column (xxhash64 — guide §2.5's
    * deterministic synthetic key, so task retries reproduce the same
    * placement; never rand()). The map side of that exchange is the
    * unavoidable single-threaded floor (decode + shuffle write); every
    * operator above it runs at session parallelism. Partition count is
    * the session's shuffle partitions — scale-parameterized, never a
    * local constant — and EXPLICIT, because the injected exchange
    * exists precisely to raise parallelism: AQE's advisory-size
    * coalescing would fold ~100 MB back into 1–2 partitions.
    *
    * Guarded: a no-op unless the file's effective split count
    * (min(rowGroups, ceil(bytes / maxPartitionBytes))) leaves at least
    * half the session's cores idle AND the per-split bytes exceed
    * `graft.scan.parallelizeMinBytes` (default 12 MB) — the measured
    * boundary: at 10.8 MB/split (the sf0.1 lineitem) the hop washes
    * against what it frees, at 15.2 MB/split (the sf1 events) and
    * above it wins 25–67%. Callers
    * OPT IN per query: the win is measured for scan pipelines with
    * heavy work between the scan and its first exchange (join probe
    * chains, exact-decimal partial aggs); shapes whose first exchange
    * immediately follows a cheap scan (windows, global top-k) only pay
    * the hop and keep [[table]]. */
  def tableParallel(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = table(spark, sfDir, name)
    val (bytes, rowGroups) = parquetLayout(spark, s"$sfDir/$name.parquet")
    val maxPB = spark.sessionState.conf.filesMaxPartitionBytes
    val effSplits = math.min(rowGroups.toLong,
      (bytes + maxPB - 1) / math.max(1L, maxPB)).max(1L)
    val cores = spark.sparkContext.defaultParallelism
    val minBytes = spark.conf.getOption("graft.scan.parallelizeMinBytes")
      .map(_.toLong).getOrElse(12L << 20)
    if (effSplits * 2 <= cores && bytes / effSplits >= minBytes) {
      val key = schemas(name).fields.head.name
      df.repartition(spark.sessionState.conf.numShufflePartitions,
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col(key)))
    } else df
  }

  /** Inference-tolerant scan — the ad-hoc-table ergonomics of the
    * reference's connector, which samples documents to discover a
    * schema (reference: src/processing/mongo_avg_laptime_by_driver
    * .py:30) instead of demanding a declared one. For parquet the
    * footer IS the schema (zero sampling cost, exact types), so this
    * reads whatever the file declares; the events `ts`/`ts_utc`
    * normalization still applies when a `ts` column is present, so
    * inferred and pinned scans stay drop-in interchangeable. Prefer
    * [[table]] for production pipelines: a pinned StructType fails
    * LOUDLY on upstream drift, where inference silently changes
    * downstream types — the same trade the reference makes in reverse.
    * Pair with `Cleaning.filterIfPresent` for columns that may be
    * absent in ad-hoc data. */
  def tableInferred(spark: SparkSession, sfDir: String, name: String): DataFrame =
    deriveTsUtc(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Sampled-inference JSON-Lines scan — the schemaless half of
    * [[readJsonl]]: discover the schema from a fraction of the lines
    * (the direct analog of the reference connector's sample-N-docs
    * inference), accepting one inference pass over `samplingRatio` of
    * the input. At 100 TB run this once on a slice, then PIN the
    * result via [[readJsonl]] — inference cost scales with the corpus,
    * a pinned schema is free. */
  def inferJsonl(spark: SparkSession, path: String,
                 samplingRatio: Double = 1.0): DataFrame =
    spark.read.option("samplingRatio", samplingRatio.toString).json(path)
}
