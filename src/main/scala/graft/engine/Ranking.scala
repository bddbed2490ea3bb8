package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking / Pareto composition — the reference's "fastest vs most
  * consistent" table: two global dense_rank windows plus a composite
  * rank sum (reference:
  * src/processing/fastest_vs_most_consistent_drivers.py:145-163).
  *
  * Scale: an unpartitioned window forces a single-partition exchange, so
  * it must ONLY ever run post-aggregation, where the input is O(groups)
  * (here ≤ a few hundred rows). The pre-aggregation path stays fully
  * parallel. Ranks are computed over values rounded to 6 decimals so the
  * ordering (and hence the ranks) is reproducible across engines/runs.
  */
object Ranking {

  /** rank_speed + rank_consistency Pareto table: dense_rank by each metric
    * ascending, composite sum, deterministic multi-key ordering, top-k.
    * Ranks order by [[Aggregates.round6Portable]]-rounded metrics (not
    * `round`): the portable floor form is bit-identical across engines,
    * so rank boundaries can never disagree with an external oracle at a
    * half-boundary the way each engine's own `round` can. */
  def paretoTopK(aggregated: DataFrame, speedCol: String, consistencyCol: String,
                 tieBreak: Seq[String], k: Int): DataFrame = {
    def r6p(c: String) = Aggregates.round6Portable(col(c))
    val bySpeed = Window.orderBy(r6p(speedCol).asc)
    val byConsistency = Window.orderBy(r6p(consistencyCol).asc)
    aggregated
      .withColumn("rank_speed", dense_rank().over(bySpeed))
      .withColumn("rank_consistency", dense_rank().over(byConsistency))
      .withColumn("rank_sum", col("rank_speed") + col("rank_consistency"))
      .orderBy(col("rank_sum").asc +: r6p(speedCol).asc
        +: r6p(consistencyCol).asc +: tieBreak.map(col(_).asc): _*)
      .limit(k)
  }

  /** Global top-k by a measure with deterministic tie-break keys. Catalyst
    * plans this as TakeOrderedAndProject — per-partition heaps, only k rows
    * cross the network per partition. */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** PER-GROUP top-k through the custom [[graft.plans.TopKPerGroup]]
    * operator (logical node + strategy + two-phase physical plan): the
    * per-group twin of TakeOrderedAndProject. Unlike the
    * `row_number().over(window) <= k` idiom — which shuffles and FULLY
    * SORTS every group — this keeps bounded k-row heaps per group and
    * prunes map-side before the exchange, so shuffle volume is
    * ≤ k·groups and memory is O(k·groups per partition). Adds a LongType
    * 1-based `rank` column ordered by `orderCols` (name, ascending?).
    *
    * Ties: ranks follow the sort order; add tie-break columns to
    * `orderCols` (as the queries here do) for deterministic results. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, SortOrder}
    import org.apache.spark.sql.types.LongType
    val spark = df.sparkSession
    // idempotently register the planner strategy on this session
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerGroupStrategy
    val child = GraftSqlBridge.analyzed(df)
    // resolve like the rest of the DataFrame API: case-insensitive unless
    // spark.sql.caseSensitive, and ambiguity is an error, not first-match
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def resolve(n: String) = {
      val hits = child.output.filter(a =>
        if (caseSensitive) a.name == n else a.name.equalsIgnoreCase(n))
      hits match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column $n not in (${child.output.map(_.name).mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"column $n is ambiguous: ${many.mkString(", ")}")
      }
    }
    val node = graft.plans.TopKPerGroup(
      groupCols.map(resolve),
      orderCols.map { case (n, asc) =>
        SortOrder(resolve(n), if (asc) Ascending else Descending) },
      k,
      AttributeReference("rank", LongType, nullable = false)(),
      child)
    GraftSqlBridge.ofRows(spark, node)
  }
}
