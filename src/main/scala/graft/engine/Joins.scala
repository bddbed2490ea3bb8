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

  /** Salted equi-join for degenerate key skew: when one join key carries a
    * disproportionate share of rows, AQE's skew split may not be enough
    * (one reducer still owns the key). Salting shards the hot key across
    * `saltBuckets` reducers: the skewed side gets a deterministic salt
    * from `saltSource`, the (small) dim side is exploded across all salt
    * values, and the join key becomes (key, salt). Result is identical to
    * the plain join; cost is |dim| × saltBuckets build rows. */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int, saltSource: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    val salted = skewed.withColumn("__salt", pmod(hash(saltSource), lit(saltBuckets)))
    val dimExploded = dim.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i)): _*)))
    salted.join(dimExploded, Seq(key, "__salt")).drop("__salt")
  }
}
