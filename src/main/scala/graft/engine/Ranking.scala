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
    * ascending, composite sum, deterministic multi-key ordering, top-k. */
  def paretoTopK(aggregated: DataFrame, speedCol: String, consistencyCol: String,
                 tieBreak: Seq[String], k: Int): DataFrame = {
    val bySpeed = Window.orderBy(round(col(speedCol), 6).asc)
    val byConsistency = Window.orderBy(round(col(consistencyCol), 6).asc)
    aggregated
      .withColumn("rank_speed", dense_rank().over(bySpeed))
      .withColumn("rank_consistency", dense_rank().over(byConsistency))
      .withColumn("rank_sum", col("rank_speed") + col("rank_consistency"))
      .orderBy(col("rank_sum").asc +: round(col(speedCol), 6).asc
        +: round(col(consistencyCol), 6).asc +: tieBreak.map(col(_).asc): _*)
      .limit(k)
  }

  /** Global top-k by a measure with deterministic tie-break keys. Catalyst
    * plans this as TakeOrderedAndProject — per-partition heaps, only k rows
    * cross the network per partition. */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)
}
