package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture generator for scale factors the driver does not
  * ship — the sf1 (≈6M-row lineitem) scale-proof decade of TESTDATA.md's
  * sf0.001/0.01/0.1 ladder, and beyond (any `sf` the disk affords).
  *
  * Faithfully mirrors the driver fixtures' schemas (pinned in
  * [[graft.engine.Sources]]) and measured distributions (TESTDATA.md /
  * FIXTURES.md; all parameters below were read off sf0.1 with DuckDB):
  * row-count ratios, categorical weights, value ranges, the
  * time-ordered event stream, the planted duplicate documents, and
  * unit-norm 64-dim embeddings. It does NOT reproduce the driver's
  * seed=42 byte stream — every correctness use is self-consistent
  * (Spark result vs DuckDB oracle over the SAME generated files), so
  * only the distribution shape matters, not the RNG identity.
  *
  * Scale-first by construction: all randomness is EXPRESSION-BASED
  * (xxhash64-derived uniforms — rerun-stable under any partitioning,
  * unlike `rand(seed)` whose draws depend on partition layout), there
  * are no driver-side loops or collects, and every table is a single
  * `spark.range(n)` projection. The one exception is the event
  * stream's global time-sort (event_id must be the time rank, as in
  * the driver fixtures) — a range-partitioned sort + one window, the
  * same shape any 100 TB event-log ingest pays once at landing time.
  *
  * Usage: `runMain graft.tools.FixtureGen <outDir> [sf]` (sf defaults
  * to 1.0). Timestamps are written as TIMESTAMP_NTZ(µs), matching the
  * round-4 driver fixtures (verify skill: "TIMESTAMP_NTZ for the µs
  * fixtures"); all generation runs in a UTC session so NTZ values are
  * midnight-UTC instants under the harness's UTC sessions.
  */
object FixtureGen {

  /** Uniform double in [0, 1): 63 low bits of xxhash64(cols…, salt).
    * 2⁻⁶³-grained — indistinguishable from continuous at any fixture
    * size. */
  private def u(salt: String, cols: Column*): Column =
    (xxhash64(cols :+ lit(salt): _*).bitwiseAND(lit(Long.MaxValue)))
      .cast("double") / lit(9.223372036854776e18)

  /** Uniform integer in [0, n). */
  private def ui(salt: String, n: Long, cols: Column*): Column =
    pmod(xxhash64(cols :+ lit(salt): _*), lit(n))

  /** Pick from a literal vocabulary, uniformly. */
  private def pick(salt: String, vocab: Seq[String], cols: Column*): Column =
    element_at(array(vocab.map(lit): _*), (ui(salt, vocab.size, cols: _*) + 1).cast("int"))

  /** round(x, 2) — generation-side only, both engines read the stored
    * value; no cross-engine rounding contract is involved. */
  private def r2(c: Column): Column = round(c, 2)

  private def ntz(c: Column): Column = c.cast("timestamp_ntz")

  /** Midnight-UTC NTZ timestamp `days` days after 1995-01-01. */
  private def dateFrom(base: String, days: Column): Column =
    ntz(date_add(to_date(lit(base)), days.cast("int")))

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: FixtureGen <outDir> [sf]")
    val outDir = args(0)
    val sf = if (args.length > 1) args(1).toDouble else 1.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, outDir, sf)
    spark.stop()
  }

  /** Row counts per table at scale factor `sf` — the driver's ladder
    * (sf0.1 → ×10 per decade; documents/embeddings floored at their
    * observed sf0.01 sizes). */
  def counts(sf: Double): Map[String, Long] = Map(
    "customer" -> math.round(150000 * sf),
    "supplier" -> math.round(10000 * sf),
    "part" -> math.round(200000 * sf),
    "orders" -> math.round(1500000 * sf),
    "lineitem" -> math.round(6000000 * sf),
    "events" -> math.round(1000000 * sf),
    "documents" -> math.max(500, math.round(50000 * sf)),
    "embeddings" -> math.max(500, math.round(20000 * sf)))

  def generate(spark: SparkSession, outDir: String, sf: Double): Unit = {
    val n = counts(sf)
    val nCust = n("customer")
    val nSupp = n("supplier")
    val nPart = n("part")
    val nOrd = n("orders")
    // one user per 10 customers, as at every driver sf
    val nUser = math.max(1L, nCust / 10)

    // The driver fixtures are single FILES named <table>.parquet (not
    // Spark's directory layout) — mirror that so every consumer
    // (Sources, tools/check_oracle.py's DuckDB views, TESTDATA.md
    // conventions) reads both generations identically. repartition(1)
    // keeps the generation itself parallel and only funnels the final
    // write through one task.
    def write(name: String, df: DataFrame): Unit = {
      val tmp = s"$outDir/.__gen_$name"
      df.repartition(1).write.mode("overwrite").parquet(tmp)
      val dir = new java.io.File(tmp)
      val part = dir.listFiles().filter(_.getName.endsWith(".parquet")) match {
        case Array(one) => one
        case other => sys.error(
          s"expected exactly one part file for $name, got ${other.length}")
      }
      val target = new java.io.File(s"$outDir/$name.parquet")
      if (target.exists()) require(target.delete(), s"cannot replace $target")
      require(part.renameTo(target), s"cannot move $part to $target")
      dir.listFiles().foreach(_.delete())
      require(dir.delete(), s"cannot clean $tmp")
      println(s"[fixturegen] wrote $name")
    }

    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    write("region", spark.range(5).select(
      col("id").cast("int").as("r_regionkey"),
      pickAt(regions, col("id")).as("r_name")))

    write("nation", spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      format_string("NATION_%d", col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey")))

    val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    write("customer", spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      ui("c_nat", 25, col("id")).cast("int").as("c_nationkey"),
      r2(lit(-1000.0) + u("c_bal", col("id")) * lit(11000.0)).as("c_acctbal"),
      pick("c_seg", segments, col("id")).as("c_mktsegment")))

    write("supplier", spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      ui("s_nat", 25, col("id")).cast("int").as("s_nationkey"),
      r2(lit(-1000.0) + u("s_bal", col("id")) * lit(11000.0)).as("s_acctbal")))

    val adjs = Seq("blue", "cold", "hot", "large", "new", "old", "red", "small")
    val nouns = Seq("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
    val ptypes = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
    write("part", spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat(pick("p_adj", adjs, col("id")), lit(" "),
        pick("p_noun", nouns, col("id"))).as("p_name"),
      format_string("Brand#%d", ui("p_brand", 25, col("id")) + 1).as("p_brand"),
      pick("p_type", ptypes, col("id")).as("p_type"),
      (ui("p_size", 50, col("id")) + 1).cast("int").as("p_size"),
      r2(lit(900.0) + col("id").cast("double") * lit(0.1)).as("p_retailprice")))

    // orders: dates uniform over the 2405 days 1995-01-01..2001-08-01,
    // totalprice uniform(1000, 500000) — the Benford (q142) and
    // daily-spine (drift family) queries key off exactly this shape
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    write("orders", spark.range(nOrd).select(
      col("id").as("o_orderkey"),
      ui("o_cust", nCust, col("id")).as("o_custkey"),
      pick("o_status", Seq("F", "O", "P"), col("id")).as("o_orderstatus"),
      r2(lit(1000.0) + u("o_total", col("id")) * lit(499000.0)).as("o_totalprice"),
      dateFrom("1995-01-01", ui("o_date", 2405, col("id"))).as("o_orderdate"),
      pick("o_prio", priorities, col("id")).as("o_orderpriority")))

    // lineitem: orderkey uniform over orders ⇒ lines-per-order is
    // Binomial(4·nOrd, 1/nOrd) ≈ Poisson(4), the driver's observed
    // shape (≈1.8% of orders get no lines); shipdate is an independent
    // uniform order-date plus a 1..95-day lag, reproducing the
    // observed [min+1d, max+95d] envelope
    write("lineitem", spark.range(n("lineitem")).select(
      ui("l_ord", nOrd, col("id")).as("l_orderkey"),
      ui("l_part", nPart, col("id")).as("l_partkey"),
      ui("l_supp", nSupp, col("id")).as("l_suppkey"),
      (ui("l_line", 7, col("id")) + 1).cast("int").as("l_linenumber"),
      (ui("l_qty", 50, col("id")) + 1).cast("double").as("l_quantity"),
      r2(lit(900.0) + u("l_price", col("id")) * lit(104100.0)).as("l_extendedprice"),
      (ui("l_disc", 11, col("id")).cast("double") / 100.0).as("l_discount"),
      (ui("l_tax", 9, col("id")).cast("double") / 100.0).as("l_tax"),
      pick("l_rflag", Seq("A", "N", "R"), col("id")).as("l_returnflag"),
      pick("l_status", Seq("F", "O"), col("id")).as("l_linestatus"),
      dateFrom("1995-01-01",
        ui("l_shipbase", 2405, col("id")) + ui("l_shiplag", 95, col("id")) + 1)
        .as("l_shipdate")))

    // events: 30 days of 2024-01, iid-uniform instants SORTED so
    // event_id is the time rank (exponential-ish inter-arrivals — the
    // gap/sessionization queries rely on that). The global sort is the
    // generator's one shuffle; the rank window runs on the sorted
    // single range, acceptable for a fixture tool (a production ingest
    // would zipWithIndex per range partition).
    val spanUs = 30L * 24 * 3600 * 1000000
    val rawEvents = spark.range(n("events")).select(
      (ui("e_ts", spanUs, col("id")) +
        lit(java.time.LocalDateTime.parse("2024-01-01T00:00:00")
          .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)).as("ts_us"),
      ui("e_user", nUser, col("id")).as("user_id"),
      pick("e_type", Seq("click", "error", "purchase", "signup", "view"),
        col("id")).as("event_type"),
      r2(-lit(50.0) * log(lit(1.0) - u("e_val", col("id")))).as("value"),
      format_string("{\"k\": %d}", ui("e_k", 100, col("id"))).as("props"))
    import org.apache.spark.sql.expressions.Window
    write("events", rawEvents
      .withColumn("event_id",
        row_number().over(Window.orderBy(col("ts_us"), col("user_id"))) - 1)
      .select(col("event_id"),
        ntz(timestamp_micros(col("ts_us"))).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props")))

    // documents: 10..100 words from the 31-word fixture vocabulary;
    // lang weighted 40/15/15/15/15; ~0.16% of docs are planted EXACT
    // duplicates of an earlier doc (the sf0.1 rate: 8 pairs / 5000
    // docs) — the seed corpus for every dedup family
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer", "data",
      "dup", "fast", "filter", "group", "hash", "join", "key", "line",
      "merge", "order", "part", "query", "row", "scan", "slow", "small",
      "sort", "spark", "stream", "table", "the", "value", "vector", "window")
    val nDoc = n("documents")
    val base = spark.range(nDoc).select(
      col("id").as("doc_id"),
      array_join(transform(
        sequence(lit(1), (ui("d_len", 91, col("id")) + 10).cast("int")),
        i => element_at(array(vocab.map(lit): _*),
          (pmod(xxhash64(col("id"), i, lit("d_word")), lit(vocab.size)) + 1)
            .cast("int"))), " ").as("text0"),
      when(u("d_lang", col("id")) < 0.4, lit("en"))
        .otherwise(pick("d_lang2", Seq("de", "es", "fr", "zh"), col("id")))
        .as("lang"),
      format_string("src%d", ui("d_src", 20, col("id"))).as("source"),
      // duplicate plant: donor id strictly below doc_id (never chains
      // at this rate in practice; groups stay pairs as in the fixtures)
      when(col("id") > 0 && u("d_dup", col("id")) < 0.0016,
        pmod(xxhash64(col("id"), lit("d_donor")), col("id")))
        .otherwise(col("id")).as("donor_id"))
    val donors = base.select(col("doc_id").as("donor_id"),
      col("text0").as("donor_text"))
    write("documents", base.join(donors, Seq("donor_id"), "left")
      .select(col("doc_id"),
        coalesce(col("donor_text"), col("text0")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")))

    // embeddings: 64 iid standard gaussians (Box–Muller over two
    // hash-uniforms), L2-normalized, FLOAT storage; labels uniform
    // 0..9 and independent of the vector (measured: within-label mean
    // cosine ≈ 0 in the driver fixtures — labels are NOT clusters)
    val dims = 64
    val gauss = transform(sequence(lit(0), lit(dims - 1)), d => {
      val u1 = (xxhash64(col("id"), d, lit("g1")).bitwiseAND(lit(Long.MaxValue))
        .cast("double") + lit(1.0)) / lit(9.223372036854776e18)
      val u2 = (xxhash64(col("id"), d, lit("g2")).bitwiseAND(lit(Long.MaxValue))
        .cast("double")) / lit(9.223372036854776e18)
      sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
    })
    write("embeddings", spark.range(n("embeddings"))
      .select(col("id").as("vec_id"), gauss.as("g"),
        ui("v_label", 10, col("id")).cast("int").as("label"))
      .withColumn("norm", sqrt(aggregate(col("g"), lit(0.0d),
        (acc, x) => acc + x * x)))
      .select(col("vec_id"),
        transform(col("g"), x => (x / col("norm")).cast("float"))
          .as("embedding"),
        col("label")))
  }

  /** element_at over a literal vocab by a 0-based index column. */
  private def pickAt(vocab: Seq[String], idx: Column): Column =
    element_at(array(vocab.map(lit): _*), (idx + 1).cast("int"))
}
