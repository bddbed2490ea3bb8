package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the closest right row within the
  * same key: backward (`right.time <= left.time`, the default, matching
  * the latest prior row) or forward (`right.time >= left.time`, the
  * earliest following row). Spark has no native operator for this; per
  * the extension ladder we *compose built-ins* before reaching for a
  * custom SparkPlan:
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

  /** Internal column names are reserved: fail fast on collision instead
    * of silently overwriting caller data via withColumn (same contract
    * as rangeJoin's __graft_rj_ prefix). */
  private def requireNoReserved(dfs: Seq[DataFrame], carryOut: Seq[String]): Unit = {
    val reserved = Set("__side", "__carry", "__back", "__fwd", "__pick", "__asof_rt")
    (dfs.flatMap(_.columns) ++ carryOut).foreach { c =>
      require(!reserved.contains(c),
        s"as-of join reserves column name '$c' internally; rename the input/output column")
    }
  }

  /** @param carry right-side columns to attach, renamed via the map.
    * @param forward false = latest right at-or-before (default);
    *                true = earliest right at-or-after (the scan runs in
    *                reverse time order; the right row still sorts first
    *                at equal times, so the match stays inclusive). */
  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
               timeCol: String, carry: Map[String, String],
               forward: Boolean = false): DataFrame = {
    requireNoReserved(Seq(left, right), carry.values.toSeq)
    val leftCols = left.columns.toSeq
    val carried = carry.toSeq.sortBy(_._2)

    // The carried right-side values travel as ONE struct so the match is
    // atomic: last(ignoreNulls) skips only the all-null struct of left
    // rows, never a null FIELD of the matched right row — carrying each
    // column independently would stitch fields from different right rows
    // whenever a carried value is legitimately NULL.
    val carryStruct = struct(carried.map { case (in, out) => col(in).as(out) }: _*)
    val lTagged = left.withColumn("__side", lit(1))
      .withColumn("__carry",
        lit(null).cast(right.select(carryStruct).schema.head.dataType))
    // right side: keys + time + carry struct, typed nulls for left-only columns
    val rTagged = leftCols.filterNot(c => keys.contains(c) || c == timeCol)
      .foldLeft(right.withColumn("__side", lit(0)).withColumn("__carry", carryStruct)) {
        case (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val unionCols = leftCols ++ Seq("__side", "__carry")
    val unioned = lTagged.select(unionCols.map(col): _*)
      .unionByName(rTagged.select(unionCols.map(col): _*))

    val timeOrder = if (forward) col(timeCol).desc else col(timeCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ carried.map { case (_, out) =>
        col(s"__carry.$out").as(out)
      }: _*)
  }

  /** Nearest-match variant: per left row, the right row minimizing
    * |right.time − left.time| (ties → the backward match, standard ASOF
    * tie-breaking). Both directions are carried in ONE union + shuffle
    * + sort — `last(ignoreNulls)` over the preceding frame for the
    * backward candidate, `first(ignoreNulls)` over the following frame
    * for the forward one — then the closer candidate wins per row.
    * (An equal-time right row sorts before the left row, so the forward
    * frame misses it — harmless: the backward carry holds it at
    * distance 0, which always wins.)
    *
    * `timeCol` must be NUMERIC (epoch micros/nanos; convert timestamps
    * first) so the distance comparison is plain arithmetic. */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  timeCol: String, carry: Map[String, String]): DataFrame = {
    requireNoReserved(Seq(left, right), carry.values.toSeq)
    val leftCols = left.columns.toSeq
    val carried = carry.toSeq.sortBy(_._2)
    val tf = "__asof_rt"
    val carryStruct = struct(
      carried.map { case (in, out) => col(in).as(out) } :+ col(timeCol).as(tf): _*)
    val lTagged = left.withColumn("__side", lit(1))
      .withColumn("__carry",
        lit(null).cast(right.select(carryStruct).schema.head.dataType))
    val rTagged = leftCols.filterNot(c => keys.contains(c) || c == timeCol)
      .foldLeft(right.withColumn("__side", lit(0)).withColumn("__carry", carryStruct)) {
        case (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val unionCols = leftCols ++ Seq("__side", "__carry")
    val unioned = lTagged.select(unionCols.map(col): _*)
      .unionByName(rTagged.select(unionCols.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
    val back = last(col("__carry"), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwd = first(col("__carry"), ignoreNulls = true)
      .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    unioned
      .withColumn("__back", back).withColumn("__fwd", fwd)
      .filter(col("__side") === 1)
      .withColumn("__pick",
        when(col("__back").isNull, col("__fwd"))
          .when(col("__fwd").isNull, col("__back"))
          .when(col(timeCol) - col(s"__back.$tf") <=
            col(s"__fwd.$tf") - col(timeCol), col("__back"))
          .otherwise(col("__fwd")))
      .select(leftCols.map(col) ++ carried.map { case (_, out) =>
        col(s"__pick.$out").as(out)
      }: _*)
  }
}
