package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** 2-D skyline (Pareto frontier): the rows no other row dominates, where
  * q dominates p iff q.x ≤ p.x ∧ q.y ≤ p.y ∧ (q.x < p.x ∨ q.y < p.y)
  * (minimize both axes; equal points co-exist). The dominance-based
  * complement of `Ranking.paretoTopK`'s rank-sum composite: no weighting,
  * just the non-dominated set.
  *
  * The textbook form is an all-pairs NOT EXISTS — O(n²), a non-starter at
  * corpus scale. This operator is two stages, both distributed:
  *
  *  1. GRID PRUNE: bucket x into B ranges (min/max from one scalar probe
  *     — a documented model-sized driver materialization), compute each
  *     bucket's min y (map-side combinable agg), and broadcast the
  *     running min over STRICTLY EARLIER buckets as a per-bucket
  *     threshold T(b). Any p with p.y > T(b) is dominated by the earlier
  *     bucket's min-y point (strictly smaller x AND strictly smaller y),
  *     so one scan drops the interior of the point cloud; survivors are
  *     typically O(B + |skyline|).
  *  2. EXACT: per distinct x keep min y (same-x dominance, a groupBy),
  *     then one ordered window over those per-x minima keeps x iff its
  *     y is STRICTLY below every earlier min (y == an earlier min ⇒ that
  *     earlier point dominates via strict x). The window is global but
  *     runs on the pruned per-x minima, not the input.
  *
  * Rows with NULL or NaN in either axis are excluded (dominance is
  * undefined there). Duplicates of a skyline point all survive (the
  * final step is a semi-join on the (x, y) value pair). */
object Skyline {

  def skyline2dMin(df: DataFrame, xCol: String, yCol: String,
                   buckets: Int = 256): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    def clean(c: String) = df.schema(c).dataType match {
      case DoubleType => col(c).isNotNull && !isnan(col(c))
      case _ => col(c).isNotNull
    }
    val pts = df.filter(clean(xCol) && clean(yCol))

    val rng = pts.agg(min(col(xCol)).cast("double").as("lo"),
      max(col(xCol)).cast("double").as("hi")).head()
    if (rng.isNullAt(0)) return pts.limit(0)
    val (lo, hi) = (rng.getDouble(0), rng.getDouble(1))

    val pruned =
      if (hi > lo && buckets > 1) {
        val width = (hi - lo) / buckets
        val bucket = least(
          floor((col(xCol).cast("double") - lit(lo)) / lit(width)),
          lit((buckets - 1).toLong)).cast("long")
        val withB = pts.withColumn("__b", bucket)
        val bmin = withB.groupBy(col("__b")).agg(min(col(yCol)).as("__bymin"))
        val wPrev = Window.orderBy(col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val thresholds = bmin
          .withColumn("__thr", min(col("__bymin")).over(wPrev))
          .select(col("__b"), col("__thr"))
        withB.join(broadcast(thresholds), Seq("__b"), "left")
          .filter(col("__thr").isNull || col(yCol) <= col("__thr"))
          .drop("__b", "__thr")
      } else pts

    val perX = pruned.groupBy(col(xCol)).agg(min(col(yCol)).as("__ymin"))
    val wRun = Window.orderBy(col(xCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val skyPoints = perX
      .withColumn("__prev", min(col("__ymin")).over(wRun))
      .filter(col("__prev").isNull || col("__ymin") < col("__prev"))
      .select(col(xCol), col("__ymin").as(yCol))
    pruned.join(skyPoints, Seq(xCol, yCol), "left_semi")
  }
}
