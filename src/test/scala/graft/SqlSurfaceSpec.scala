package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide SQL-text surface: q161 proves `spark.sql` over the
  * registered views once; this spec widens the claim to every oracle
  * whose dialect is portable — each `SparkEntry.oracleSql` text is fed
  * through `spark.sql(...)` over [[graft.engine.Sources.registerTables]]
  * views and its result compared against the DataFrame-API twin. A
  * free second correctness net: the oracle SQL was written for DuckDB,
  * so any query whose text ALSO executes identically on Spark SQL has
  * its semantics pinned by three independent evaluators (DataFrame
  * plan, Spark SQL parser/planner, DuckDB).
  *
  * Oracles using DuckDB-only dialect (`::` casts, `//` integer
  * division, `unnest`/`string_split`, `quantile_cont`, `epoch_us`,
  * list lambdas, …) don't parse or don't type-check on Spark and are
  * excluded by the try — the portable subset is asserted to stay
  * ≥ 40 queries so dialect drift can't silently hollow the net out.
  * Known semantic divergences (text runs on both engines but means
  * something else on Spark — e.g. the events view exposes `ts` as a
  * raw µs LONG where DuckDB's parquet view types it TIMESTAMP) are
  * pinned in [[knownDivergent]] with the reason.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  /** Queries whose oracle text EXECUTES on Spark SQL but legitimately
    * computes something different there (dialect semantics, not an
    * engine bug). Each entry needs a reason. */
  private val knownDivergent: Map[String, String] = Map()

  /** The EXACT portable set, pinned: every oracle text known to parse,
    * run, and match on Spark SQL. A query falling OUT of this set now
    * fails by name (previously the floor was a bare ≥ 40 count, under
    * which up to 17 queries could silently lose their third evaluator);
    * a query joining the set is added here deliberately. */
  private val portableManifest: Set[String] = Set(
    "q01_avg_value_by_user", "q03_speed_consistency", "q05_pareto_rank",
    "q06_slope_by_user_type", "q07_slope_price_qty", "q08_dup_keys",
    "q09_dedup_latest", "q102_line_fit", "q105_ks_drift", "q108_skyline",
    "q10_integrity_events", "q113_anomaly_zscore", "q11_star_revenue",
    "q125_ecdf", "q129_ewma", "q12_semi_join", "q132_stream_user_stats",
    "q133_higher_moments", "q134_distribution_position",
    "q137_weighted_median", "q139_bitwise_aggs", "q13_anti_join",
    "q147_welch_t", "q149_value_trajectory", "q14_topk_orders",
    "q152_hhi", "q155_wilson_interval", "q158_null_semantics",
    "q15_window_running", "q162_fk_audit", "q16_set_ops",
    "q19_lang_source_stats", "q20_exact_dedup", "q33_slope_aggregator",
    "q38_integrity_lineitem", "q39_rollup_revenue", "q40_pivot_by_type",
    "q48_bloom_semi_join", "q49_topk_per_group", "q52_cube_quantity",
    "q61_ntile_quartiles", "q62_grouping_sets", "q64_histogram",
    "q67_rank_family", "q72_unpivot", "q73_dynamic_pivot", "q74_map_agg",
    "q75_pagination", "q219_keyset_page", "q78_slope_summary",
    "q79_subquery_scalar",
    "q80_subquery_exists", "q81_multiset_ops", "q83_share_of_total",
    "q87_salted_join", "q89_fuzzy_pairs", "q90_funnel", "q92_exact_corr")

  private def canon(rows: Array[org.apache.spark.sql.Row],
                    cols: Seq[String]): Seq[Seq[Any]] = {
    val order = cols.zipWithIndex.sortBy(_._1).map(_._2)
    rows.toSeq.map(r => order.map(i => r.get(i)))
      .sortBy(_.map(v => if (v == null) "\u0000" else v.toString).mkString("|"))
  }

  private def sameVal(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Double, y: Double) =>
      (x.isNaN && y.isNaN) || x == y ||
        math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
    case (x: Float, y: Float) => (x.isNaN && y.isNaN) || x == y
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) =>
      x.compareTo(y) == 0
    case (x: Number, y: Number) =>
      // Spark SQL may widen differently than the DataFrame plan
      // (DECIMAL sums, window count types); compare numerically
      new java.math.BigDecimal(x.toString)
        .compareTo(new java.math.BigDecimal(y.toString)) == 0
    case (x, y) => x == y
  }

  test("≥40 oracle SQL texts run via spark.sql and match their DataFrame twin") {
    graft.engine.Sources.registerTables(spark, sfDir)
    var matched = List.empty[String]
    var mismatched = List.empty[String]
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      spark.catalog.clearCache()
      val viaSql =
        try {
          val df = spark.sql(sql)
          Some((df.collect(), df.columns.toSeq))
        } catch { case _: Throwable => None } // DuckDB-only dialect
      viaSql.foreach { case (sqlRows, sqlCols) =>
        val dfq = SparkEntry.queries(name)(spark, sfDir)
        val dfRows = dfq.collect()
        val a = canon(sqlRows, sqlCols.map(_.toLowerCase))
        val b = canon(dfRows, dfq.columns.toSeq.map(_.toLowerCase))
        val same = sqlCols.map(_.toLowerCase).sorted ==
          dfq.columns.toSeq.map(_.toLowerCase).sorted &&
          a.size == b.size &&
          a.zip(b).forall { case (ra, rb) =>
            ra.zip(rb).forall { case (x, y) => sameVal(x, y) } }
        if (same) matched ::= name
        else if (!knownDivergent.contains(name)) mismatched ::= name
      }
    }
    assert(mismatched.isEmpty,
      s"oracle SQL ran on Spark but diverged from the DataFrame twin " +
        s"(pin with a reason in knownDivergent if dialect-legitimate): " +
        mismatched.sorted.mkString(", "))
    val lost = portableManifest -- matched.toSet
    assert(lost.isEmpty,
      s"queries fell OUT of the pinned portable set (dialect drift in " +
        s"their oracle SQL?): ${lost.toSeq.sorted.mkString(", ")}")
    val gained = matched.toSet -- portableManifest
    assert(gained.isEmpty,
      s"queries newly portable — add them to portableManifest: " +
        gained.toSeq.sorted.mkString(", "))
    info(s"spark.sql-portable and matching: ${matched.size} queries (pinned)")
  }
}
