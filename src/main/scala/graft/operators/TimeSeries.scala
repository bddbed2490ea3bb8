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
}
