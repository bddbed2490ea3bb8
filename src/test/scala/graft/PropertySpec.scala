package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.engine._

/** Property tests for the semantic invariants SURVEY.md §5 calls out:
  * equal-weight vs lap-weight coincidence, slope shift-invariance,
  * cleaning idempotence, dedup key uniqueness. Uses ScalaCheck generators
  * with fixed seeds (deterministic cases, no scalatestplus bridge needed);
  * Spark actions are expensive, so 8 cases per property.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cases[T](g: Gen[T], n: Int = 8): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val valuesGen: Gen[List[Double]] =
    Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0)))

  test("equal-weight avg == lap-weighted avg when all fine groups have equal counts") {
    cases(Gen.zip(valuesGen, valuesGen)).foreach { case (g1, g2) =>
      val n = math.min(g1.size, g2.size)
      val rows = g1.take(n).map(("u", "d1", _)) ++ g2.take(n).map(("u", "d2", _))
      val df = rows.toDF("user", "day", "v")
      val eq = Aggregates.twoLevelStats(df, Seq("user"), Seq("day"), "v", 1, 1)
        .collect().head.getAs[Double]("avg_of_avgs")
      val lap = Aggregates.groupedStats(df, Seq("user"), "v")
        .collect().head.getAs[Double]("avg_value")
      assert(math.abs(eq - lap) < 1e-9, s"g1=$g1 g2=$g2")
    }
  }

  test("OLS slope is invariant under x-shift") {
    cases(Gen.zip(valuesGen, Gen.chooseNum(-50.0, 50.0))).foreach { case (ys, shift) =>
      val pts = ys.zipWithIndex.map { case (y, i) => ("g", i.toDouble, y) }
      val shifted = pts.map { case (k, x, y) => (k, x + shift, y) }
      def slopeOf(rows: List[(String, Double, Double)]): Option[Double] = {
        val r = SlopeOLS.slopeByMoments(rows.toDF("k", "x", "y"),
          Seq("k"), $"x", $"y", 1).collect().head
        if (r.isNullAt(r.fieldIndex("slope"))) None
        else Some(r.getAs[Double]("slope"))
      }
      (slopeOf(pts), slopeOf(shifted)) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-6, s"ys=$ys shift=$shift")
        case (a, b) => assert(a.isEmpty === b.isEmpty)
      }
    }
  }

  test("null/NaN cleaning is idempotent and complete") {
    val vGen = Gen.listOf(Gen.oneOf[java.lang.Double](
      java.lang.Double.valueOf(1.5), null, java.lang.Double.valueOf(Double.NaN)))
    cases(vGen).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
      val once = df.filter(Cleaning.notMissing($"v"))
      val twice = once.filter(Cleaning.notMissing($"v"))
      assert(once.count() === twice.count())
      assert(once.collect().forall(r => !r.isNullAt(1) && !r.getDouble(1).isNaN))
    }
  }

  test("latestByKey output keys are unique and cover the input") {
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 100L)))
    cases(rowsGen).foreach { rows =>
      val df = rows.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "version")
      val out = Dedup.latestByKey(df, Seq("k"), Seq($"version")).collect()
      val keys = out.map(_.getAs[Long]("k"))
      assert(keys.distinct.length === keys.length)
      assert(keys.toSet === rows.map(_._1).toSet)
    }
  }
}
