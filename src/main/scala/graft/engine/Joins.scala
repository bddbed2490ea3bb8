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

  /** Point-in-interval range join — an operator Spark has no native
    * physical strategy for (a raw `l.ts BETWEEN r.lo AND r.hi` join plans
    * as a nested-loop over every row pair).
    *
    * Standard bucket-expansion layout: pick a `bucketWidth` in the units
    * of the point column, bucket the point side by `point div width`,
    * explode each interval into the buckets it covers, and equi-join on
    * the bucket before applying the exact range predicate. Both sides
    * shuffle-partition on the bucket key, so the O(|points|·|intervals|)
    * nested loop becomes a hash join whose cost is the true match volume
    * plus interval replication (⌈span/width⌉ rows per interval — choose
    * width ≈ the median interval span so replication stays O(1)).
    *
    * Contract: `point`, `lo`, `hi` are LONGs in the same unit (epoch
    * days/seconds/...; callers convert timestamps first). Negative
    * values are handled: bucketing uses FLOOR division, so an interval
    * straddling zero still lands in every bucket it covers. Match is
    * the half-open `lo <= point < hi`. Output columns: left columns
    * then right columns, like an inner join. */
  def rangeJoin(points: DataFrame, point: Column,
                intervals: DataFrame, lo: Column, hi: Column,
                bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    require(bucketWidth > 0, "bucketWidth must be positive")
    // internal columns: fail fast on collision instead of silently
    // overwriting caller data via withColumn
    val Seq(ptc, bktc, loc, hic) =
      Seq("__graft_rj_pt", "__graft_rj_bkt", "__graft_rj_lo", "__graft_rj_hi")
    (points.columns ++ intervals.columns).foreach { c =>
      require(!c.startsWith("__graft_rj_"),
        s"rangeJoin reserves the __graft_rj_ column prefix; input has '$c'")
    }
    // floor division on longs without double round-trips (epoch-nanos
    // exceed 2^53 and would silently corrupt under floating division):
    // n - pmod(n, w) is an exact multiple of w, so integer `div` of it
    // is exact and equals floorDiv(n, w) for negative n too
    def fdiv(n: String): String = s"(($n - (($n % $bucketWidth) + $bucketWidth) % $bucketWidth) div $bucketWidth)"
    val l = points
      .withColumn(ptc, point.cast("long"))
      .withColumn(bktc, expr(fdiv(ptc)))
    val r = intervals
      .withColumn(loc, lo.cast("long"))
      .withColumn(hic, hi.cast("long"))
      .filter(col(loc) < col(hic))
      .withColumn(bktc,
        explode(sequence(expr(fdiv(loc)), expr(fdiv(s"($hic - 1)")))))
    l.join(r, Seq(bktc))
      .filter(col(ptc) >= col(loc) && col(ptc) < col(hic))
      .drop(bktc, ptc, loc, hic)
  }

  /** Bloom-filter semi-join reduction — the manual form of Spark's
    * runtime row-level filtering (InjectRuntimeFilter), exposed as an
    * operator so a pipeline can apply it where the optimizer's
    * heuristics would not (e.g. the build side is only *known* to be
    * selective by the author, or the filter should apply before an
    * expensive upstream transform).
    *
    * Shape: aggregate the build side's keys into ONE bloom-filter row
    * (partial aggregation makes this a tree-reduce, shuffling one
    * sketch per map task), broadcast it, and pre-filter the probe side
    * with a codegen'd `might_contain` before the exact semi join. At
    * 100 TB the win is shuffle volume: the probe side drops to
    * ~|matching| + fp·|probe| rows BEFORE its exchange, instead of
    * shuffling every probe row to discover non-matches at the join.
    * False positives are removed by the exact join, so the result is
    * identical to `semi(probe, build, …)`. */
  /** `expectedItems` sizes the sketch; pass <= 0 to derive it from the
    * build side's actual count (one extra cheap job — the build side is
    * small by contract, and an undersized sketch silently degrades the
    * fp rate toward 1 as data grows, turning the prefilter into a no-op
    * at exactly the scales it exists for). */
  def bloomSemiJoin(probe: DataFrame, probeKey: Column,
                    build: DataFrame, buildKey: Column,
                    expectedItems: Long = -1L): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.functions._
    // xxhash64 is type-sensitive: INT 5 and BIGINT 5 hash differently, so
    // mismatched key types would silently drop true matches (false
    // NEGATIVES — worse than a weak prefilter). Fail fast instead.
    val probeType = probe.select(probeKey).schema.head.dataType
    val buildType = build.select(buildKey).schema.head.dataType
    require(probeType == buildType,
      s"bloomSemiJoin keys must have identical types (probe=$probeType, " +
        s"build=$buildType): xxhash64 hashes the binary representation, so " +
        "a type mismatch silently drops matching rows — cast both keys to " +
        "a common type first")
    val items =
      if (expectedItems > 0) expectedItems
      else math.max(build.count(), 1000L)
    // the bloom hashes xxhash64(key), same convention as the built-in
    // runtime filter: the sketch stores longs regardless of key type
    val bloomAgg = GraftSqlBridge.column(
      new BloomFilterAggregate(
        GraftSqlBridge.expression(xxhash64(buildKey)), items)
        .toAggregateExpression())
    // might_contain requires a CONSTANT bloom, so the sketch is built
    // eagerly and embedded as a binary literal — O(numBits) bytes of
    // model-sized driver state, the same payload a broadcast would ship.
    // (The build side runs twice — sketch + exact join — like the
    // built-in runtime filter's duplicated creation-side plan.)
    val bloomBytes = build.agg(bloomAgg.as("__bloom")).head().get(0)
    val mightContain = GraftSqlBridge.column(
      BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bloomBytes, org.apache.spark.sql.types.BinaryType),
        GraftSqlBridge.expression(xxhash64(probeKey))))
    // null sketch (empty build side) ⇒ might_contain yields NULL ⇒ the
    // filter drops every probe row — exactly the empty semi join.
    semi(probe.where(mightContain), build, probeKey === buildKey)
  }

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
