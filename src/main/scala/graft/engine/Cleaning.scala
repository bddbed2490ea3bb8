package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Null/NaN cleaning semantics of the reference.
  *
  * The reference's central data-quality invariant is "missing means NULL
  * **or** NaN" — every Spark job there filters both
  * (reference: src/processing/tyre_degradation_by_stint.py:33-45,
  * src/processing/fastest_vs_most_consistent_drivers.py:64). We centralize
  * it so every operator applies the identical predicate, which Catalyst
  * pushes into the parquet scan (NULL half) and evaluates codegen'd (NaN
  * half).
  */
object Cleaning {

  /** col IS NULL OR isnan(col) — the reference's "missing" predicate. */
  def isMissing(c: Column): Column = c.isNull || isnan(c)

  /** Usable measure: NOT NULL AND NOT NaN. */
  def notMissing(c: Column): Column = c.isNotNull && !isnan(c)

  /** Schema-adaptive filter: apply `p` only when `colName` exists, mirroring
    * the reference's `"col" in df.columns` probes
    * (reference: src/processing/fastest_vs_most_consistent_drivers.py:67-85).
    * Keeps one cleaning function serving schema variants — plan-time only,
    * no runtime cost.
    */
  def filterIfPresent(df: DataFrame, colName: String)(p: Column => Column): DataFrame =
    if (df.columns.contains(colName)) df.filter(p(col(colName))) else df
}
