package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `right.time <= left.time` within the same key. Spark has no native
  * operator for this; per the extension ladder we *compose built-ins*
  * before reaching for a custom SparkPlan:
  *
  *   tag both sides → union → one shuffle on the key → in-partition sort
  *   by (time, side) → carry right-side values forward with
  *   `last(..., ignoreNulls)` over an unbounded-preceding frame → keep
  *   left rows.
  *
  * Cost at scale: exactly one shuffle + one sort over |L| + |R| rows,
  * fully parallel across keys — the same shape as a sort-merge join, with
  * no pair explosion for dense right sides. Ties at equal time order the
  * right row first, so the match is inclusive (`<=`), which is DuckDB /
  * standard ASOF semantics. Precondition: (key, time) unique on the right
  * side (otherwise which duplicate is carried is unspecified).
  */
object AsOfJoin {

  /** @param carry right-side columns to attach, renamed via the map. */
  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
               timeCol: String, carry: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = carry.toSeq.sortBy(_._2)

    // left side: real left columns, typed nulls for the carry outputs
    val lTagged = carried.foldLeft(left.withColumn("__side", lit(1))) {
      case (df, (in, out)) =>
        df.withColumn(out, lit(null).cast(right.schema(in).dataType))
    }
    // right side: keys + time + carry outputs, typed nulls for left-only columns
    val rTagged = leftCols.filterNot(c => keys.contains(c) || c == timeCol)
      .foldLeft(carried.foldLeft(right.withColumn("__side", lit(0))) {
        case (df, (in, out)) => df.withColumn(out, col(in))
      }) { case (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val unionCols = (leftCols :+ "__side") ++ carried.map(_._2)
    val unioned = lTagged.select(unionCols.map(col): _*)
      .unionByName(rTagged.select(unionCols.map(col): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carriedForward = carried.foldLeft(unioned) { case (df, (_, out)) =>
      df.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    carriedForward.filter(col("__side") === 1).drop("__side")
  }
}
