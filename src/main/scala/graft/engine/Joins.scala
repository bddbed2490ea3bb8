package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Join surface — an extension beyond reference parity (the reference has
  * zero joins, SURVEY.md §2.3); required by the star-schema fixtures.
  *
  * Scale policy (100 TB):
  *   - Dimension tables (region/nation/customer/supplier/part) are hinted
  *     `broadcast` — replicated to every executor, no shuffle of the fact.
  *   - Fact-to-fact joins (lineitem ⋈ orders) are left un-hinted: Catalyst
  *     + AQE pick shuffle-hash/sort-merge (and skew-split) from runtime
  *     stats; forcing broadcast there would OOM at scale.
  *   - Semi/anti joins ship only the join keys of the probe side.
  */
object Joins {

  /** Fold a fact through broadcast dimension joins. */
  def starBroadcast(fact: DataFrame, dims: Seq[(DataFrame, Column)]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, cond)) =>
      acc.join(broadcast(dim), cond, "inner")
    }

  /** EXISTS: rows of `left` with at least one match in `right`. */
  def semi(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** NOT EXISTS: rows of `left` with no match in `right`. */
  def anti(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")
}
