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
      // twoLevelStats reports/re-averages level-1 means at the engine's
      // 6-decimal determinism boundary, so the coincidence holds to that
      // boundary, not to machine epsilon
      assert(math.abs(eq - lap) < 1e-6, s"g1=$g1 g2=$g2")
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

  test("rangeJoin equals the naive BETWEEN join on random points/intervals") {
    import org.apache.spark.sql.functions.col
    val ptsGen = Gen.listOfN(30, Gen.chooseNum(0L, 200L))
    val ivalGen = Gen.listOfN(10,
      Gen.zip(Gen.chooseNum(0L, 180L), Gen.chooseNum(0L, 40L)))
    cases(Gen.zip(ptsGen, ivalGen, Gen.chooseNum(1L, 25L))).foreach {
      case (ps, ivs, width) =>
        val points = ps.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("pid", "t")
        val intervals = ivs.zipWithIndex.map { case ((lo, span), i) =>
          (i.toLong, lo, lo + span) }.toDF("iid", "lo", "hi")
        val got = Joins.rangeJoin(points, col("t"), intervals,
            col("lo"), col("hi"), width)
          .select(col("pid"), col("iid"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val naive = points.crossJoin(intervals)
          .filter(col("t") >= col("lo") && col("t") < col("hi"))
          .select(col("pid"), col("iid"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === naive, s"width=$width ivs=$ivs")
    }
  }

  test("topKPerGroup equals a reference top-k on random groups (with ties)") {
    import org.apache.spark.sql.functions.col
    // small value domain forces duplicate sort keys; id column breaks ties
    val rowsGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0, 4), Gen.chooseNum(0, 5)))
    cases(Gen.zip(rowsGen, Gen.chooseNum(1, 5))).foreach { case (rows, k) =>
      val df = rows.zipWithIndex.map { case ((g, v), i) =>
        (s"g$g", v.toDouble, i.toLong) }.toDF("g", "v", "id")
      val got = Ranking.topKPerGroup(df, Seq("g"),
          Seq("v" -> false, "id" -> true), k)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
          r.getLong(3))).toSet
      val expect = rows.zipWithIndex.map { case ((g, v), i) =>
        (s"g$g", v.toDouble, i.toLong) }
        .groupBy(_._1).toSeq.flatMap { case (_, rs) =>
          rs.sortBy(r => (-r._2, r._3)).take(k).zipWithIndex
            .map { case (r, i) => (r._1, r._2, r._3, (i + 1).toLong) }
        }.toSet
      assert(got === expect, s"k=$k")
    }
  }

  test("connectedComponents equals union-find on random graphs") {
    import org.apache.spark.sql.functions.col
    // 25 nodes, variable edge counts: sparse graphs exercise many small
    // components and long chains (pointer-jumping path), dense ones the
    // giant-component path
    val edgesGen = Gen.chooseNum(1, 35).flatMap(m => Gen.listOfN(m,
      Gen.zip(Gen.chooseNum(0L, 24L), Gen.chooseNum(0L, 24L))))
    cases(edgesGen, n = 6).foreach { raw =>
      val edges = raw.filter(e => e._1 != e._2)
      whenever(edges.nonEmpty) {
        val df = edges.toDF("a", "b")
        val got = graft.operators.Graph.connectedComponents(df, "a", "b")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        // reference union-find with path compression
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // canonicalize both sides to min-of-component
        val expect = nodes.map { n =>
          n -> nodes.filter(m => find(m) == find(n)).min
        }.toMap
        assert(got === expect, s"edges=$edges")
      }
    }
  }

  test("large-star/small-star fallback equals union-find on random graphs") {
    import org.apache.spark.sql.functions.col
    // maxIter=0 routes connectedComponents straight through the Kiveris
    // star-rewrite escalation — the same oracle as the fast path, so the
    // two algorithms are pinned to identical component labelings
    val edgesGen = Gen.chooseNum(1, 35).flatMap(m => Gen.listOfN(m,
      Gen.zip(Gen.chooseNum(0L, 24L), Gen.chooseNum(0L, 24L))))
    cases(edgesGen, n = 4).foreach { raw =>
      val edges = raw.filter(e => e._1 != e._2)
      whenever(edges.nonEmpty) {
        val df = edges.toDF("a", "b")
        val got = graft.operators.Graph
          .connectedComponents(df, "a", "b", maxIter = 0)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expect = nodes.map { n =>
          n -> nodes.filter(m => find(m) == find(n)).min
        }.toMap
        assert(got === expect, s"edges=$edges")
      }
    }
  }

  test("run-length ffill stats equal the exploded-grid reference on random series") {
    import org.apache.spark.sql.functions.col
    // sparse-to-dense random bucket sets per key; values with >6-decimal
    // noise so the dec6 quantization boundary is actually exercised
    val obsGen = Gen.chooseNum(1, 30).flatMap(m => Gen.listOfN(m,
      Gen.zip(Gen.chooseNum(0, 2), Gen.chooseNum(0L, 40L),
        Gen.chooseNum(-1000000, 1000000))))
    cases(obsGen, n = 5).foreach { raw =>
      // one row per (key, bucket): last write wins in the reference too
      val obs = raw.map { case (k, b, v) => ((s"k$k", b), v / 7919.0) }
        .toMap.toSeq.map { case ((k, b), v) => (k, b, v) }
      val df = obs.toDF("k", "b", "v")
      val got = graft.operators.TimeSeries.resampleFfillStats(df, "k", "b", "v")
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val expect = obs.groupBy(_._1).map { case (k, rows) =>
        val byBucket = rows.map(r => r._2 -> r._3).toMap
        val (b0, b1) = (byBucket.keys.min, byBucket.keys.max)
        // literal grid + forward fill, then the oracle's arithmetic:
        // per-bucket dec6 quantization, exact sum, portable rounding
        var lastV = 0.0
        val filled = (b0 to b1).map { b =>
          lastV = byBucket.getOrElse(b, lastV); lastV
        }
        // valueOf (shortest decimal repr), not new BigDecimal(binary
        // expansion): Spark's double→DECIMAL cast quantizes the shortest
        // repr, and the two disagree exactly at half boundaries
        val dec6 = filled.map(v =>
          java.math.BigDecimal.valueOf(v).setScale(6, java.math.RoundingMode.HALF_UP))
        val mean = dec6.reduce(_.add(_)).doubleValue / filled.length
        k -> (filled.length.toLong, byBucket.size.toLong,
          math.floor(mean * 1e6 + 0.5) / 1e6)
      }
      assert(got === expect, s"obs=$obs")
    }
  }

  test("asofNearest == brute-force nearest with backward ties (1000 random cases)") {
    // 1000 independent random (key, time) sets — including duplicate
    // left times, equal-time left/right rows, empty right sides, and
    // equidistant candidates — run as ONE Spark action by folding the
    // case id into the join key (asofNearest partitions by key, so
    // cases never interact). The subtle semantics under test
    // (AsOfJoin.scala): an equal-time right row wins at distance 0 via
    // the backward carry, and an exact distance tie picks the BACKWARD
    // candidate.
    val caseGen = Gen.zip(
      Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0, 1), Gen.chooseNum(0L, 30L)))),
      Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0, 1), Gen.chooseNum(0L, 30L)))))
    val all = cases(caseGen, 1000)
    val leftRows = all.zipWithIndex.flatMap { case ((l, _), cid) =>
      l.map { case (k, t) => (cid.toLong, k, t) } }
    val rightRows = all.zipWithIndex.flatMap { case ((_, r), cid) =>
      // precondition: (key, time) unique on the right side
      r.distinct.map { case (k, t) => (cid.toLong, k, t, t * 1000 + k) } }
    whenever(leftRows.nonEmpty) {
      val got = graft.operators.AsOfJoin.asofNearest(
          leftRows.toDF("cid", "k", "t"),
          rightRows.toDF("cid", "k", "t", "v"),
          Seq("cid", "k"), "t", Map("v" -> "rv"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .sorted(Ordering.by((x: (Long, Int, Long, Option[Long])) =>
          (x._1, x._2, x._3, x._4.getOrElse(Long.MinValue))))
      val rightByKey = rightRows.groupBy(r => (r._1, r._2))
      val expect = leftRows.map { case (cid, k, t) =>
        val cands = rightByKey.getOrElse((cid, k), Nil)
        val back = cands.filter(_._3 <= t).sortBy(_._3).lastOption
        val fwd = cands.filter(_._3 > t).sortBy(_._3).headOption
        val pick = (back, fwd) match {
          case (None, f) => f
          case (b, None) => b
          case (Some(b), Some(f)) =>
            if (t - b._3 <= f._3 - t) Some(b) else Some(f)
        }
        (cid, k, t, pick.map(_._4))
      }.sorted(Ordering.by((x: (Long, Int, Long, Option[Long])) =>
        (x._1, x._2, x._3, x._4.getOrElse(Long.MinValue))))
      assert(got.toSeq === expect)
    }
  }

  test("dedupSpans equals the brute-force span remover on random corpora") {
    // tiny vocab (3 tokens, 27 possible 3-grams over ~40 positions) so
    // corpus-duplicated spans actually occur; brute force recomputes
    // occurrence counts, coverage, and the rebuilt text independently
    val vocab = Seq("a", "b", "c")
    val docGen = Gen.chooseNum(4, 10)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
    val corpusGen = Gen.chooseNum(3, 6).flatMap(k => Gen.listOfN(k, docGen))
    cases(corpusGen).foreach { corpus =>
      val n = 3
      val docsSeq = corpus.zipWithIndex.map { case (tk, i) =>
        (i.toLong, tk.mkString(" "))
      }
      val toks = docsSeq.map { case (id, t) => id -> t.split(" ", -1) }.toMap
      val occ = docsSeq.flatMap { case (id, _) =>
        val tk = toks(id)
        (0 to tk.length - n).map(p => tk.slice(p, p + n).mkString(" "))
      }.groupBy(identity).view.mapValues(_.size).toMap
      val expect = docsSeq.map { case (id, _) =>
        val tk = toks(id)
        val starts = (0 to tk.length - n)
          .filter(p => occ(tk.slice(p, p + n).mkString(" ")) >= 2).toSet
        val covered = tk.indices
          .filter(q => (math.max(0, q - n + 1) to q).exists(starts)).toSet
        (id, (tk.length.toLong, covered.size.toLong,
          tk.indices.filterNot(covered).map(tk).mkString(" ")))
      }.toMap
      val got = graft.operators.TextAnalysis
        .dedupSpans(docsSeq.toDF("doc_id", "text"), n)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
        .toMap
      assert(got === expect, s"corpus=$docsSeq")
    }
  }

  test("prototypePruning: keepBp=10000 keeps all; kept sets are monotone in keepBp") {
    val embGen = Gen.chooseNum(8, 16).flatMap(k =>
      Gen.listOfN(k, Gen.listOfN(2, Gen.chooseNum(-50.0, 50.0))))
    cases(embGen, n = 4).foreach { vs =>
      val emb = vs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
        .toDF("vec_id", "embedding")
      def kept(bp: Int): Set[Long] = graft.operators.KMeansQuantizer
        .prototypePruning(emb, 3, 1, bp)
        .collect().filter(_.getBoolean(5)).map(_.getLong(0)).toSet
      val all = kept(10000)
      assert(all.size == vs.size, "keepBp=10000 must keep every vector")
      val k5 = kept(5000)
      val k8 = kept(8000)
      assert(k5.subsetOf(k8) && k8.subsetOf(all),
        s"kept sets must be monotone in keepBp: $k5 / $k8")
    }
  }

  test("audio fingerprint survives the WAV codec round-trip on random signals") {
    // arbitrary IN-DOMAIN unsigned-PCM signals (length ≥ the
    // sub-window count — shorter signals are rejected loudly since
    // round 11: the engine's zero-filled empty sub-windows and the
    // oracle's populated-only lead() chain diverge there) encoded
    // through the real writer must fingerprint exactly like the
    // JVM-side arithmetic replay
    val sigGen = Gen.chooseNum(16, 80)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 255)))
    val sigs = cases(sigGen, n = 12).zipWithIndex
      .map { case (s, i) => (i.toLong, s.toArray) }
    val sw = 16
    val payloads = sigs.map { case (id, s) =>
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(s.map(_.toByte)), fmt, s.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      (id, bos.toByteArray)
    }.toDF("doc_id", "payload")
    val got = graft.operators.Multimodal
      .audioFingerprints(spark, payloads, sw)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    sigs.foreach { case (id, s) =>
      val e = new Array[Long](sw)
      s.zipWithIndex.foreach { case (u, i) =>
        e((i.toLong * sw / s.length).toInt) += math.abs(u - 128)
      }
      val fp = (0 until sw - 1)
        .foldLeft(0L)((acc, k) => if (e(k + 1) > e(k)) acc | (1L << k) else acc)
      assert(got(id) == ((s.length.toLong, fp)), s"signal $id")
    }
  }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body
}
