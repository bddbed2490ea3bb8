package graft.engine

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` packaging of the grouped-OLS moment sketch — the
  * ergonomic UDAF form of [[SlopeOLS]] (SURVEY.md §7.4). Pure public API:
  * `Aggregator[IN, BUF, OUT]`, usable with `Dataset.groupByKey(...).agg`.
  *
  * The buffer is five scalars (count + four moment sums), so partial
  * aggregation state is O(1) per group and merge is associative — the
  * same partial/final shape Catalyst gives the built-in `avg`s, which
  * keeps this correct and cheap on a 1000-executor shuffle.
  */
object SlopeAggregator {

  /** (n, Σx, Σy, Σxy, Σx²) */
  case class Moments(n: Long, sx: Double, sy: Double, sxy: Double, sxx: Double)

  /** (n_obs, slope or null for a zero-variance group) */
  case class SlopeOut(n_obs: Long, slope: Option[Double])

  /** IN = (x, y) observation. */
  val agg: Aggregator[(Double, Double), Moments, SlopeOut] =
    new Aggregator[(Double, Double), Moments, SlopeOut] {
      override def zero: Moments = Moments(0L, 0.0, 0.0, 0.0, 0.0)

      override def reduce(b: Moments, in: (Double, Double)): Moments = {
        val (x, y) = in
        Moments(b.n + 1, b.sx + x, b.sy + y, b.sxy + x * y, b.sxx + x * x)
      }

      override def merge(a: Moments, b: Moments): Moments =
        Moments(a.n + b.n, a.sx + b.sx, a.sy + b.sy, a.sxy + b.sxy, a.sxx + b.sxx)

      override def finish(m: Moments): SlopeOut =
        if (m.n == 0) SlopeOut(0L, None)
        else {
          // derive means first — numerically the same arrangement as the
          // avg()-based moment formula (and the SQL oracle), avoiding the
          // catastrophic cancellation of the n·Σxy − Σx·Σy form
          val xm = m.sx / m.n; val ym = m.sy / m.n
          val xym = m.sxy / m.n; val xxm = m.sxx / m.n
          val varX = xxm - xm * xm
          SlopeOut(m.n, if (varX == 0.0) None else Some((xym - xm * ym) / varX))
        }

      override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
      override def outputEncoder: Encoder[SlopeOut] = Encoders.product[SlopeOut]
    }
}
