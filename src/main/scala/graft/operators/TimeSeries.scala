package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series resampling — the feature-engineering step that turns an
  * irregular event stream into a fixed-cadence series (pandas
  * `resample('1h').ffill()`), per key, at corpus scale.
  *
  * The naive statement materializes the full grid (generate hours →
  * left join observations → last-IGNORE-NULLS window): grid rows =
  * Σ per-key spans, which for a SPARSE series is orders of magnitude
  * larger than the data (a year-long span with hourly-obs density 1%
  * explodes 100× — at 100 TB that grid is the job). This operator
  * computes identical per-key fill statistics in RUN-LENGTH form:
  * each observation carries the whole gap until the next one
  * (`gap = next_bucket − bucket` via lead + partition-max in one
  * per-key sort), so the filled-series sum is the exact decimal
  * Σ dec6(v)·gap and NO grid row ever exists. Work scales with
  * |observations|, independent of span. */
object TimeSeries {

  /** Per-key stats of the bucket-resampled, forward-filled series:
    * (`n_buckets` grid size, `n_observed` buckets with data,
    * `avg_filled` persistence-weighted mean, 6-decimal portable).
    *
    * Input must be ONE ROW PER (key, bucket) — pre-aggregate raw
    * events first (e.g. arg-max by an ordering column for
    * last-observation-wins). The fill is total because every span
    * starts at an observed bucket. `valueCol` values are summed at
    * DECIMAL(18,6) — see `Aggregates.exactSum` for the |v| < 10¹²
    * domain bound. */
  def resampleFfillStats(obs: DataFrame, keyCol: String, bucketCol: String,
                         valueCol: String): DataFrame = {
    val wLead = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol).asc)
    val wAll = Window.partitionBy(col(keyCol))
    obs
      .withColumn("__next",
        coalesce(lead(col(bucketCol), 1).over(wLead),
          max(col(bucketCol)).over(wAll) + 1))
      .withColumn("__gap", col("__next") - col(bucketCol))
      .groupBy(col(keyCol))
      .agg(sum(col("__gap")).as("n_buckets"),
        count(lit(1)).as("n_observed"),
        // dec6(v)·gap in DECIMAL arithmetic ≡ summing dec6(v) once per
        // filled bucket — exact under any partial-agg merge order, so
        // the run-length form is bit-identical to the exploded grid
        (sum(col(valueCol).cast(DecimalType(18, 6)) * col("__gap"))
          .cast("double") / sum(col("__gap"))).as("__m"))
      .select(col(keyCol), col("n_buckets"), col("n_observed"),
        graft.engine.Aggregates.round6Portable(col("__m")).as("avg_filled"))
  }

  /** SCD-2 history build: compress an ordered change log into validity
    * intervals per key — the slowly-changing-dimension shape every
    * warehouse ingest needs ("value X was current from t1 until t2").
    *
    * Consecutive rows with an unchanged `attr` collapse into one
    * version (null-safe comparison: NULL→NULL is "no change"); each
    * surviving row opens at its own `timeCol` and closes at the next
    * version's open (NULL = still current). `tieCol` breaks equal
    * timestamps deterministically.
    *
    * Scale: two windows over the SAME (key × time) partitioning — one
    * sort, no extra shuffle between them; parallel across keys, never
    * global. */
  def scd2Intervals(df: DataFrame, keyCols: Seq[String], timeCol: String,
                    tieCol: String, attr: String): DataFrame = {
    val wScan = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col(tieCol).asc)
    val changed = df
      .withColumn("__prev_t", lag(col(timeCol), 1).over(wScan))
      .withColumn("__prev_a", lag(col(attr), 1).over(wScan))
      // first row per key (no predecessor) always opens a version;
      // later rows only when the attribute value actually changed
      .filter(col("__prev_t").isNull || !(col(attr) <=> col("__prev_a")))
      .drop("__prev_t", "__prev_a")
    changed
      .withColumn("version", row_number().over(wScan).cast("long"))
      .withColumn("valid_from", col(timeCol))
      .withColumn("valid_to", lead(col(timeCol), 1).over(wScan))
  }

  /** Merge overlapping-or-touching intervals per key (gaps-and-islands):
    * [1,5] + [4,9] + [9,12] → [1,12]. Inputs are (start, end] in any
    * integral time domain; exact integer arithmetic throughout.
    *
    * One window pass: an interval starts a new island iff its start
    * exceeds the running max end of every earlier interval (window max,
    * 1-preceding frame), then a running sum of the island flags labels
    * islands and a per-(key, island) aggregate collapses them. Same
    * (key × start) sort serves both windows; parallel across keys.
    * Precondition: end ≥ start per row (a malformed negative-length
    * interval would silently split islands its true extent should
    * bridge — validate upstream, as q107's `value > 0` filter does). */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String],
                     startCol: String, endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(startCol).asc, col(endCol).asc)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    df
      .withColumn("__prev_end", max(col(endCol)).over(wPrev))
      .withColumn("__new_island",
        when(col("__prev_end").isNull || col(startCol) > col("__prev_end"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("__new_island")).over(w))
      .groupBy((keyCols.map(col) :+ col("island")): _*)
      .agg(min(col(startCol)).as("merged_start"),
        max(col(endCol)).as("merged_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** Exponentially-weighted moving average with α = ½ over the last
    * `k` observations per key — the trend-smoothing signal next to
    * [[rollingZScore]]'s anomaly flags. α = ½ is chosen so EVERY
    * weight 2⁻ʲ is a pure exponent shift: v·2⁻ʲ is exact in IEEE
    * doubles (no rounding at all), the weight sums are exact binary
    * fractions, and the single final division is correctly rounded —
    * the whole statistic is engine-portable without any decimal
    * machinery. Truncating at k bounds the lag chain (k fixed lag
    * columns, one window sort) and the dropped tail weight is 2⁻ᵏ of
    * the total — immaterial at k ≥ 8. Rows with fewer than k
    * predecessors renormalize over the weights present (lag NULL ⇒
    * term and weight both drop). */
  def ewmaHalf(df: DataFrame, keyCols: Seq[String], orderCol: String,
               valueCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 62, "k in [1, 62]")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol).asc)
    val terms = (0 until k).map { j =>
      // j = 0 is the row itself (lag-0 support differs across engines)
      val lagged = if (j == 0) col(valueCol) else lag(col(valueCol), j).over(w)
      (coalesce(lagged * lit(math.pow(0.5, j)), lit(0.0)),
        when(lagged.isNotNull, lit(math.pow(0.5, j))).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.withColumn("ewma", num / den)
  }

  /** Rolling z-score anomaly detection: each value scored against the
    * mean/stddev of the `n` PRECEDING observations in its key's series
    * (the current row never sees itself — no self-masking). Moments come
    * from exact DECIMAL window sums (order-independent; see
    * `Aggregates.exactSum` for the |v| < 10¹² domain bound), so the
    * score is bit-identical across engines and partitionings.
    *
    * Output adds `n_ctx`, `ctx_mean`, `ctx_std`, `zscore` (NULL until
    * `minCtx` context rows exist or when the context is constant).
    * One window sort per key; frame state is O(n). */
  def rollingZScore(df: DataFrame, keyCols: Seq[String], orderCol: String,
                    valueCol: String, n: Int, minCtx: Int): DataFrame = {
    // The textbook ROWS BETWEEN n PRECEDING AND 1 PRECEDING frame makes
    // Spark re-aggregate the whole frame PER ROW (sliding frames have no
    // retraction) — O(n·rows) decimal adds. The same moments come from
    // the DIFFERENCE OF TWO GROWING FRAMES (prefix sums at t−1 and
    // t−n−1), which the window engine maintains incrementally in O(1)
    // per row — and because the sums are exact DECIMAL, the subtraction
    // is bit-identical to the sliding-frame sum (never true for float
    // accumulators; this is what makes the rewrite safe). `orderCol`
    // must be unique within a key for the prefixes to be well-defined.
    val base = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol).asc)
    val upTo1 = base.rowsBetween(Window.unboundedPreceding, -1)
    val upToN1 = base.rowsBetween(Window.unboundedPreceding, -(n + 1))
    val v6 = col(valueCol).cast(DecimalType(18, 6))
    val zeroD = lit(java.math.BigDecimal.ZERO)
    val cnt = count(col(valueCol)).over(upTo1) - count(col(valueCol)).over(upToN1)
    val s1 = (coalesce(sum(v6).over(upTo1), zeroD)
      - coalesce(sum(v6).over(upToN1), zeroD)).cast("double")
    val s2 = (coalesce(sum(v6 * v6).over(upTo1), zeroD)
      - coalesce(sum(v6 * v6).over(upToN1), zeroD)).cast("double")
    val mean = s1 / cnt
    val varPop = (s2 - s1 * s1 / cnt) / cnt
    val std = sqrt(greatest(varPop, lit(0.0)))
    df.withColumn("n_ctx", cnt)
      .withColumn("ctx_mean", when(cnt >= minCtx, mean))
      .withColumn("ctx_std", when(cnt >= minCtx, std))
      .withColumn("zscore",
        when(cnt >= minCtx && std > 0,
          (col(valueCol) - mean) / std))
  }
}
