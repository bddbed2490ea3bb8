package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped least-squares slope via moment aggregates — the reference's Q3
  * ("tyre degradation per stint"):
  *   slope = (E[xy] − E[x]·E[y]) / (E[x²] − E[x]²)  =  covar_pop / var_pop
  * computed entirely inside one hash aggregation (4 extra `avg`s), never
  * collecting points to the driver.
  * Reference: src/processing/tyre_degradation_by_stint.py:54-84.
  *
  * Scale: one shuffle on the group key; the per-group state is O(1)
  * (five running moments), so this regresses billions of points across
  * millions of groups in a single partial+final agg pass.
  */
object SlopeOLS {

  /** Explicit-moment form — mirrors the reference formula term by term.
    * Emits keys + n + slope (+ x range). `when(var=0, null)` guards the
    * degenerate vertical-line group exactly like the reference
    * (tyre_degradation_by_stint.py:77). */
  def slopeByMoments(df: DataFrame, keys: Seq[String], x: Column, y: Column,
                     minN: Long): DataFrame = {
    val xd = x.cast("double")
    val yd = y.cast("double")
    val m = df
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_obs"),
        avg(xd).as("x_mean"),
        avg(yd).as("y_mean"),
        avg(xd * yd).as("xy_mean"),
        avg(xd * xd).as("xx_mean"),
        min(xd).as("min_x"),
        max(xd).as("max_x"))
      .filter(col("n_obs") >= minN)
    val covXY = col("xy_mean") - col("x_mean") * col("y_mean")
    val varX = col("xx_mean") - col("x_mean") * col("x_mean")
    m.withColumn("slope",
      when(varX === 0d, lit(null)).otherwise(covXY / varX))
  }

  /** Full line fit — slope, intercept AND R² — from EXACT decimal
    * moments (the q92 discipline applied to regression): the five Σs
    * accumulate at DECIMAL(38,12), so the aggregation is order-free
    * under any partial-merge schedule, and the closed-form combination
    * runs in doubles with a fixed operand order (±, ×, ÷ are IEEE-
    * correctly-rounded ⇒ engine-identical). Degenerate groups guard to
    * NULL: vertical lines (var x = 0) have no slope; R² is NULL when
    * either variance is 0 (constant y fits trivially; the ratio is
    * 0/0). Same single hash-agg shape as [[slopeByMoments]] — O(1)
    * state per group, one shuffle. */
  def fitLineExact(df: DataFrame, keys: Seq[String], x: Column, y: Column,
                   minN: Long): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 12)
    val xd = x.cast("double")
    val yd = y.cast("double")
    val m = df
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_obs"),
        sum(xd.cast(d38)).as("sx"),
        sum(yd.cast(d38)).as("sy"),
        sum((xd * yd).cast(d38)).as("sxy"),
        sum((xd * xd).cast(d38)).as("sxx"),
        sum((yd * yd).cast(d38)).as("syy"))
      .filter(col("n_obs") >= minN)
    lineClosedForm(m)
  }

  /** Shared closed-form tail over columns (n_obs, sx, sy, sxy, sxx,
    * syy): the SAME double operand order for every moment
    * representation, so [[fitLineExact]] and [[fitLineFixedPoint]] are
    * bit-identical whenever their moments are the same rationals. */
  private def lineClosedForm(m: DataFrame): DataFrame = {
    def dbl(c: String) = col(c).cast("double")
    // n·Σxy − Σx·Σy and n·Σxx − Σx² (= n²·cov, n²·var): the standard
    // cross-multiplied forms, exact decimals until the double cast
    val covN = (col("n_obs") * dbl("sxy")) - (dbl("sx") * dbl("sy"))
    val varXN = (col("n_obs") * dbl("sxx")) - (dbl("sx") * dbl("sx"))
    val varYN = (col("n_obs") * dbl("syy")) - (dbl("sy") * dbl("sy"))
    m.withColumn("slope", when(varXN === 0d, lit(null)).otherwise(covN / varXN))
      .withColumn("intercept",
        when(varXN === 0d, lit(null))
          .otherwise((dbl("sy") - col("slope") * dbl("sx")) / col("n_obs")))
      .withColumn("r2",
        when(varXN === 0d || varYN === 0d, lit(null))
          .otherwise((covN * covN) / (varXN * varYN)))
      .drop("sx", "sy", "sxy", "sxx", "syy")
  }

  /** Fixed-point line fit: [[fitLineExact]] semantics for ALREADY
    * INTEGRAL inputs (counts, cents, any scaled measure), with the
    * decimal accumulators replaced by [[Aggregates.limbSums]] two-limb
    * LONG sums — the whole per-row path stays in whole-stage codegen
    * (measured ~6× on the fact-table moment queries), the per-GROUP
    * reconstruction is exact DECIMAL(38,0), and the closed form is the
    * shared [[lineClosedForm]], so results are bit-identical to the
    * decimal path on the same integers.
    *
    * Slope/intercept come out in the scaled domain (cents in → slope
    * cents-per-x); r² is scale-invariant. Caller divides by its scale
    * factor if it wants source units. Bounds: |x·y|, |x²|, |y²| < 2^63
    * per row and rows_per_group < 2^63 / max(|m|/2^20, 2^20) — see
    * limbSums. */
  def fitLineFixedPoint(df: DataFrame, keys: Seq[String], xInt: Column,
                        yInt: Column, minN: Long): DataFrame = {
    val aggs =
      Aggregates.limbSums(xInt, "sx") ++ Aggregates.limbSums(yInt, "sy") ++
        Aggregates.limbSums(xInt * yInt, "sxy") ++
        Aggregates.limbSums(xInt * xInt, "sxx") ++
        Aggregates.limbSums(yInt * yInt, "syy")
    val m = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_obs"), aggs: _*)
      .filter(col("n_obs") >= minN)
      .select((keys.map(col) :+ col("n_obs")) ++ Seq(
        Aggregates.limbTotal("sx").as("sx"),
        Aggregates.limbTotal("sy").as("sy"),
        Aggregates.limbTotal("sxy").as("sxy"),
        Aggregates.limbTotal("sxx").as("sxx"),
        Aggregates.limbTotal("syy").as("syy")): _*)
    lineClosedForm(m)
  }

  /** Built-in-aggregate form: covar_pop/var_pop are the 1:1 Catalyst
    * built-ins for the same math (SURVEY.md §2.4). */
  def slopeByCovar(df: DataFrame, keys: Seq[String], x: Column, y: Column,
                   minN: Long): DataFrame = {
    val xd = x.cast("double")
    val yd = y.cast("double")
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_obs"),
        covar_pop(xd, yd).as("cov_xy"),
        var_pop(xd).as("var_x"))
      .filter(col("n_obs") >= minN)
      .withColumn("slope",
        when(col("var_x") === 0d, lit(null)).otherwise(col("cov_xy") / col("var_x")))
  }
}
