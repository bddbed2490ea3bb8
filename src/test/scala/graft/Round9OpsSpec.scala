package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Round-9 operators: the corpus-relative shingle-df band (quantile +
  * fan-out budget + floor) behind the containment/quote family, and
  * its df-profile surface. Closed-form threshold cases on literal df
  * tables, band-regime behavior on planted corpora, and equivalence
  * with the fixed band where the floor dominates. */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Band threshold over a literal list of per-shingle dfs. */
  private def bandMax(dfs: Seq[Long], qBp: Int, floor: Long,
                      budget: Long): Long =
    NearDup.shingleDfBandMax(
      dfs.zipWithIndex.map { case (d, i) => (s"s$i", d) }
        .toDF("shingle", "__df"),
      qBp, floor, budget).collect().head.getLong(0)

  test("shingleDfBandMax: quantile, budget, floor and empty-histogram arms, closed form") {
    // dfs [1, 2, 2, 3, 3, 3, 100]: hist over repeated = {2→2, 3→3, 100→1},
    // n = 6; cum = 2, 5, 6; cumΣdf² = 8, 35, 10035
    val dfs = Seq(1L, 2L, 2L, 3L, 3L, 3L, 100L)
    // p90 quantile = first df with cum·10⁴ ≥ 6·9000 → df 100; budget 50
    // admits through df 3 (35 ≤ 50 < 10035) → min binds at 3; floor 2
    assert(bandMax(dfs, 9000, 2, 50) == 3L)
    // unconstrained budget: the quantile is the binding term
    assert(bandMax(dfs, 9000, 2, 1000000000L) == 100L)
    // p50: cum 2·10⁴ < 6·5000? 20000 ≥ 30000 is false at df 2; df 3 has
    // 5·10⁴ ≥ 3·10⁴ → quantile 3
    assert(bandMax(dfs, 5000, 2, 1000000000L) == 3L)
    // the budget binds EVEN BELOW the floor — the hard-bound arm
    // (floor lifts only the quantile): least(b=3, max(50, q=100)) = 3
    assert(bandMax(dfs, 9000, 50, 50) == 3L)
    // floor lifts the quantile when the budget is unconstrained
    assert(bandMax(dfs, 2000, 50, 1000000000L) == 50L)
    // a first class over budget still keeps the rarest class
    assert(bandMax(dfs, 9000, 2, 5) == 2L)
    // no repeated shingles at all → floor
    assert(bandMax(Seq(1L, 1L, 1L), 9000, 7, 100) == 7L)
  }

  /** 2 quote-related docs + 20 identical boilerplate docs: the df
    * saturation microcosm. Quote shingles have df 2, boilerplate df 20. */
  private lazy val floodDocs = {
    val quote = "alpha beta gamma delta epsilon"
    val long = s"intro words here $quote trailing content words beyond"
    val boiler = (0 until 10).map(i => s"x$i").mkString(" ")
    (Seq((1L, quote), (2L, long)) ++
      (3L to 22L).map(i => (i, boiler))).toDF("doc_id", "text")
  }

  test("quantile band under saturation: budget drops the flood class, keeps the rare quote") {
    // hist: {2 → 3 shingles, 20 → 8}; budget 100 admits df 2 (Σ 12) but
    // not df 20 (Σ 3212) → band 2: boilerplate leaves the index, the
    // quote pair stays findable — the capability the fixed band loses
    // (a fixed maxShingleDf = 1 here would return nothing)
    val got = NearDup.containmentPairsQuantileBand(floodDocs,
        minContainment = 0.8, quantileBp = 9000, dfFloor = 2,
        fanoutBudget = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(got.keySet == Set((1L, 2L)), s"got $got")
    assert(got((1L, 2L)) == 1.0)
  }

  test("quantile band ≡ fixed band where the floor dominates (the gate-SF regime)") {
    val fixed = NearDup.containmentPairs(floodDocs, 0.8, maxShingleDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // max df (20) < floor (50): band = floor, bit-identical results
    val banded = NearDup.containmentPairsQuantileBand(floodDocs, 0.8,
        quantileBp = 9000, dfFloor = 50, fanoutBudget = 1000000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(banded == fixed)
    assert(fixed.nonEmpty, "vacuous equivalence — fixture lost its pairs")
  }

  test("shingleDfProfile: exact cumulative histogram with band flags") {
    val rows = NearDup.shingleDfProfile(floodDocs, 9000, 2, 100)
      .orderBy(col("df").asc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      (2L, 3L, 3L, 12L, 1, 2L),
      (20L, 8L, 11L, 3212L, 0, 2L)))
  }

  test("naiveBayesSourceConfusion: disjoint vocabularies classify perfectly; doc total preserved") {
    val d = Seq(
      (1L, "aa bb aa", "s1"), (2L, "bb aa bb aa", "s1"), (3L, "aa aa", "s1"),
      (4L, "xx yy xx", "s2"), (5L, "yy yy xx", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Classify.naiveBayesSourceConfusion(d, buckets = 64, salt = "nb-spec")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("s1", "s1") -> 3L, ("s2", "s2") -> 2L),
      s"disjoint-vocab corpus must self-classify on the diagonal, got $out")
    // determinism: identical rerun
    val again = Classify.naiveBayesSourceConfusion(d, 64, "nb-spec")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(again == out)
  }

  test("perplexityBuckets: closed-form class histogram split on a literal corpus") {
    // global LM: c(x)=4, c(y)=2, total 6 → lp(x)=ln(4/6)→−0.405465,
    // lp(y)=ln(2/6)→−1.098612 (6 dp). Classes asc: {−1.098612: 2 docs},
    // {−0.405465: 1 doc}; k=2 → cum 2 of 3 → bucket 1, cum 3 → bucket 2.
    val d = Seq((1L, "x x x x"), (2L, "y"), (3L, "y")).toDF("doc_id", "text")
    val rows = TextAnalysis.perplexityBuckets(d, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.toSeq == Seq(
      (1L, 2L, -1.098612, -1.098612, 1.0),
      (2L, 1L, -0.405465, -0.405465, 4.0)))
  }

  test("pHashes: real codec round-trip reproduces the pixel-model hash bit for bit") {
    val spark0 = spark
    val d = (1L to 60L).map(i => Tuple1(i)).toDF("doc_id")
    val got = Multimodal.pHashes(spark0, Multimodal.pngPayloads(spark0, d))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // independent JVM replay of the deterministic pixel model (round
    // 12: content-id planted twins, hash-mixed pixels, 48-bit parity
    // fold)
    def expected(id: Long): (Long, Long, Long) = {
      val cid = if (id % 50 == 27) id - 27
        else if (id % 50 == 31) id - 12 else id
      val w = (8 + cid % 5).toInt
      val h = (8 + cid % 4).toInt
      def p0(x: Int, y: Int): Long = {
        val t = (cid * 2654435761L + x * 40503L + y * 30011L +
          x.toLong * y * 12289L) % 1000003L
        (t * t % 1000003L) % 256L
      }
      // the near twin (id ≡ 31 mod 50) swaps the first two pixels
      def p(x: Int, y: Int): Long =
        if (id % 50 == 31 && y == 0 && x <= 1) p0(1 - x, 0) else p0(x, y)
      val px = for (y <- 0 until h; x <- 0 until w)
        yield ((y * w + x) % 48, p(x, y))
      val n = px.size.toLong
      val s = px.map(_._2).sum
      val bits = px.foldLeft(0L) { case (acc, (j, v)) =>
        if (v * n >= s) acc ^ (1L << j) else acc
      }
      (w.toLong, h.toLong, bits)
    }
    for (id <- 1L to 60L) assert(got(id) == expected(id), s"doc $id")
  }

  test("planted image twins: doc ≡ 27 (mod 50) carries its donor's exact payload") {
    val spark0 = spark
    val d = Seq(0L, 27L, 50L, 77L, 28L).map(Tuple1(_)).toDF("doc_id")
    val ph = Multimodal.pHashes(spark0, Multimodal.pngPayloads(spark0, d))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(ph(27L) === ph(0L), "doc 27 must carry doc 0's image")
    assert(ph(77L) === ph(50L), "doc 77 must carry doc 50's image")
    assert(ph(28L) !== ph(0L), "a non-plant must keep its own content")
  }

  test("planted image NEAR twins: doc ≡ 31 (mod 50) is within hamming 2 of its donor") {
    val spark0 = spark
    val d = Seq(19L, 31L, 69L, 81L).map(Tuple1(_)).toDF("doc_id")
    val ph = Multimodal.pHashes(spark0, Multimodal.pngPayloads(spark0, d))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    Seq((31L, 19L), (81L, 69L)).foreach { case (twin, donor) =>
      assert(ph(twin)._1 === ph(donor)._1 && ph(twin)._2 === ph(donor)._2,
        "near twin keeps the donor's dims")
      val h = java.lang.Long.bitCount(ph(twin)._3 ^ ph(donor)._3)
      assert(h <= 2, s"sum-preserving pixel swap flips at most 2 bits: $h")
    }
  }

  test("pHashClassPairs: classes collapse duplicates; pairs within dims at hamming <= T only") {
    val ph = Seq(
      (1L, 4L, 4L, 3L),   // class (4,4,3): docs 1, 2
      (2L, 4L, 4L, 3L),
      (3L, 4L, 4L, 7L),   // hamming(3, 7) = 1 -> pairs with the class above
      (4L, 5L, 4L, 3L),   // same hash, different dims -> never paired
      (5L, 4L, 4L, 60L))  // hamming(3, 60) = 6 -> over threshold
      .toDF("doc_id", "width", "height", "phash")
    val got = Multimodal.pHashClassPairs(ph, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(got.toSeq == Seq((4L, 4L, 3L, 7L, 2L, 1L, 1L, 3L, 1L)),
      s"got ${got.toSeq}")
  }

  test("quality scorecard: source census partitions the corpus; every rate well-domained") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q200_quality_scorecard")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val corpus = graft.engine.Sources.table(spark, sfDir, "documents")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_._1).toSet == corpus.keySet)
    for ((src, n, sw, lp, df, acc) <- rows) {
      assert(n == corpus(src), s"$src census")
      assert(sw >= 0 && sw <= 1, s"$src stopword ratio $sw")
      assert(lp < 0, s"$src LM score must be a negative log-prob, got $lp")
      assert(df >= 0 && df <= 1, s"$src dup fraction $df")
      assert(acc >= 0 && acc <= 1, s"$src self-accuracy $acc")
    }
  }

  test("dupSpanStats: positional multiplicity — cross-doc and SELF-repeats both count") {
    val d = Seq(
      (1L, "a b c d e f"),      // grams: "a b c d e", "b c d e f"
      (2L, "a b c d e x"),      // grams: "a b c d e", "b c d e x"
      (3L, "z z z z z z z"),    // 3 positions of "z z z z z" — self-dup
      (4L, "too short here"))   // < 5 tokens → absent
      .toDF("doc_id", "text")
    val out = TextAnalysis.dupSpanStats(d, 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      1L -> ((2L, 1L, 0.5)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((3L, 3L, 1.0))), s"got $out")
    assert(!out.contains(4L), "a doc below the span width has no positions")
  }
}
