package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Round-10 operators: the capped pHash class-pair path (the
  * star-reduction guard for many-distinct-hash image corpora) and the
  * 8×8 box-mean resample arm of the perceptual hash. */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sfDir = "/root/testdata/sf0.001"

  test("capped pHash class pairs bound a many-distinct-hash flood; anchors reached") {
    // 37 distinct hash CLASSES (one image each), every one sharing band
    // 0 (bits 0..11 all zero): base 0 plus one bit set among 12..47 —
    // anchor↔member hamming 1, member↔member 2, all within threshold,
    // so the UNCAPPED class join emits the full C(37,2) quadratic set
    // while the capped path star-reduces every over-cap bucket to its
    // min-phash anchor class
    val ph = (Seq(0L) ++ (12 until 48).map(b => 1L << b)).zipWithIndex
      .map { case (hash, i) => (i.toLong, 8L, 6L, hash) }
      .toDF("doc_id", "width", "height", "phash")
    val full = Multimodal.pHashClassPairs(ph, maxHamming = 3)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(full.size == 36 * 37 / 2, s"uncapped flood must be quadratic: ${full.size}")
    val cappedRows = Multimodal.pHashClassPairsCapped(ph, 3,
      DedupKnobs.PHashClassBucketCap).collect()
    val capped = cappedRows.map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(capped.size <= 40, s"class-pair volume not bounded: ${capped.size}")
    // every flooded class reaches the anchor class (phash 0), and every
    // emitted edge passed the exact hamming verify
    (12 until 48).foreach(b => assert(capped.contains((0L, 1L << b)),
      s"star edge (0, 1<<$b) missing"))
    cappedRows.foreach(r => assert(r.getAs[Long]("hamming") <= 3L))
  }

  test("capped pHash class pairs equal the exact ones when no bucket exceeds the cap") {
    val ph = Multimodal.pHashes(spark,
      Multimodal.pngPayloads(spark, graft.engine.Sources.table(spark, sfDir, "documents")))
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
      r.getLong(7), r.getLong(8))
    val exact = Multimodal.pHashClassPairs(ph, 3).collect().map(key).toSet
    val capped = Multimodal.pHashClassPairsCapped(ph, 3, Long.MaxValue)
      .collect().map(key).toSet
    assert(capped === exact)
  }

  test("resampled class pairs: hash-keyed classes, hamming gate, counts and anchors") {
    val rh = Seq(
      (1L, 8L, 8L, 5L, 9L),    // class (hi 5, lo 9): docs 1, 2
      (2L, 16L, 16L, 5L, 9L),  //   …across DIFFERENT dims (the point)
      (3L, 8L, 8L, 5L, 11L),   // hamming((5,9),(5,11)) = 1 -> pairs
      (4L, 8L, 8L, 5L, 57L))   // hamming vs (5,9) = 2, vs (5,11) = 3 -> over
      .toDF("doc_id", "width", "height", "ph_hi", "ph_lo")
      .select(col("doc_id"), col("ph_hi"), col("ph_lo"))
    val got = Multimodal.resampledClassPairsCapped(rh, 1, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    // only the hamming-1 class pair survives; the two-doc class spans
    // two dims because classes key on the hash alone
    assert(got.toSeq == Seq((5L, 9L, 5L, 11L, 2L, 1L, 1L, 3L, 1L)),
      s"got ${got.toSeq}")
  }

  test("capped resampled class pairs bound a flooded band bucket; anchors reached") {
    // 49 classes all sharing band 0 (low 16 bits zero): base (0,0) plus
    // one bit set among lo[16..31] / hi[0..31] — anchor↔member hamming
    // 1, member↔member 2, so an uncapped join would emit C(49,2); the
    // capped path must star-reduce to the 48 anchor edges
    val rh = (Seq((0L, 0L)) ++
        (16 until 32).map(b => (0L, 1L << b)) ++
        (0 until 32).map(b => (1L << b, 0L))).zipWithIndex
      .map { case ((hi, lo), i) => (i.toLong, hi, lo) }
      .toDF("doc_id", "ph_hi", "ph_lo")
    val rows = Multimodal.resampledClassPairsCapped(rh, 3, 8).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet
    assert(pairs.size == 48, s"flood must star-reduce to 48 edges: ${pairs.size}")
    (16 until 32).foreach(b => assert(pairs.contains((0L, 0L, 0L, 1L << b))))
    (0 until 32).foreach(b => assert(pairs.contains((0L, 0L, 1L << b, 0L))))
    rows.foreach(r => assert(r.getAs[Long]("hamming") <= 3L))
  }

  /** Encode one genuine PNG for the resample tests. */
  private def pngOf(id: Long, w: Int, h: Int,
                    px: (Int, Int) => Int): (Long, Array[Byte]) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    for (y <- 0 until h; x <- 0 until w) r.setSample(x, y, 0, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    (id, bos.toByteArray)
  }

  test("resampled aHash is scale-invariant: integer upscales hash identically") {
    // the property the native-raster hash (q198) cannot have: the SAME
    // content at 8×8, 16×16 (2× pixel replication) and 24×24 (3×) must
    // land on ONE fingerprint — each 8×8 cell of the upscale is a
    // constant box whose mean is exactly the source pixel, and the
    // image mean is unchanged by replication
    def pat(x: Int, y: Int): Int = (x * 37 + y * 11) % 256
    val payloads = Seq(
      pngOf(1L, 8, 8, pat),
      pngOf(2L, 16, 16, (x, y) => pat(x / 2, y / 2)),
      pngOf(3L, 24, 24, (x, y) => pat(x / 3, y / 3)))
      .toDF("doc_id", "payload")
    val got = Multimodal.pHashesResampled(spark, payloads, 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) === got(2L), s"2× upscale must hash identically: $got")
    assert(got(1L) === got(3L), s"3× upscale must hash identically: $got")
  }

  test("resampled aHash reproduces the integer box-mean replay bit for bit") {
    val d = (1L to 40L).map(Tuple1(_)).toDF("doc_id")
    val got = Multimodal.pHashesResampled(spark,
        Multimodal.pngPayloads(spark, d), 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // independent JVM replay of pixel model + integer resample
    def expected(id: Long): (Long, Long, Long, Long) = {
      val cid = if (id % 50 == 27) id - 27
        else if (id % 50 == 31) id - 12 else id
      val w = (8 + cid % 5).toInt
      val h = (8 + cid % 4).toInt
      def p0(x: Int, y: Int): Long = {
        val t = (cid * 2654435761L + x * 40503L + y * 30011L +
          x.toLong * y * 12289L) % 1000003L
        (t * t % 1000003L) % 256L
      }
      def p(x: Int, y: Int): Long =
        if (id % 50 == 31 && y == 0 && x <= 1) p0(1 - x, 0) else p0(x, y)
      val sImg = (for (y <- 0 until h; x <- 0 until w) yield p(x, y)).sum
      val nImg = w.toLong * h
      var hi = 0L
      var lo = 0L
      for (j <- 0 until 8; i <- 0 until 8) {
        val x0 = i * w / 8; val x1 = math.max((i + 1) * w / 8, x0 + 1)
        val y0 = j * h / 8; val y1 = math.max((j + 1) * h / 8, y0 + 1)
        val box = for (y <- y0 until y1; x <- x0 until x1) yield p(x, y)
        if (box.sum * nImg >= sImg * box.size) {
          val k = j * 8 + i
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
      }
      (w.toLong, h.toLong, hi, lo)
    }
    for (id <- 1L to 40L) assert(got(id) == expected(id), s"doc $id")
  }

  // ─────────────────── duplicate-span removal (q204) ───────────────────

  test("dedupSpans cuts corpus-duplicated spans, cross-doc and self-repeat") {
    val docs = Seq(
      (1L, "a b c d e f"),      // shares 3-gram "a b c" with doc 2
      (2L, "x y a b c z"),
      (3L, "p q r s p q r t"),  // self-repeats "p q r"
      (4L, "short one"),        // < n tokens: passes through verbatim
      (5L, "m n o"),            // fully duplicated against doc 6
      (6L, "m n o"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.dedupSpans(docs, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got(1L) == ((6L, 3L, "d e f")))
    assert(got(2L) == ((6L, 3L, "x y z")))
    // starts 0 and 4 cover positions 0-2 and 4-6; "s" (3) and "t" (7) survive
    assert(got(3L) == ((8L, 6L, "s t")))
    assert(got(4L) == ((2L, 0L, "short one")))
    assert(got(5L) == ((3L, 3L, "")))
    assert(got(6L) == ((3L, 3L, "")))
  }

  test("dedupSpans is the identity on docs dupSpanStats marks clean") {
    val docs = graft.engine.Sources.table(spark, sfDir, "documents")
    val stats = TextAnalysis.dupSpanStats(docs, 5)
      .select(col("doc_id"), col("n_dup"))
    val joined = TextAnalysis.dedupSpans(docs, 5)
      .join(stats, Seq("doc_id"), "left")
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (cleaned, text) = (r.getAs[String]("cleaned"), r.getAs[String]("text"))
      val nDup = Option(r.getAs[java.lang.Long]("n_dup")).map(_.toLong)
      // n_dup == 0 (or too short for any gram) ⇒ nothing may be removed;
      // split-on-space + rejoin is lossless, so cleaned == text exactly
      if (nDup.forall(_ == 0L))
        assert(cleaned == text && r.getAs[Long]("n_removed") == 0L,
          s"doc ${r.getLong(0)} mutated without a duplicated span")
      else assert(r.getAs[Long]("n_removed") > 0L)
    }
  }

  // ───────────────── prototypicality pruning (q205) ─────────────────

  test("prototypePruning keeps the hardest ceil-fraction of a cluster") {
    // k = 1: seed is vec 1, one Lloyd step lands the centroid on the
    // mean (2.0); dists 4, 1, 9 → hardest-first order v3, v1, v2;
    // keepBp 3334 on 3 vecs keeps rank ≤ 2 ((rnk-1)·10⁴ < 3·3334)
    val emb = Seq(
      (1L, Seq(0.0f)), (2L, Seq(1.0f)), (3L, Seq(5.0f)))
      .toDF("vec_id", "embedding")
    val got = KMeansQuantizer.prototypePruning(emb, 1, 1, 3334)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got(3L) == ((9.0, 1L, 3L, true)))
    assert(got(1L) == ((4.0, 2L, 3L, true)))
    assert(got(2L) == ((1.0, 3L, 3L, false)))
  }

  test("prototypePruning invariants on the fixture embeddings") {
    val emb = graft.engine.Sources.table(spark, sfDir, "embeddings")
    val rows = KMeansQuantizer.prototypePruning(emb, 4, 1, 5000).collect()
    assert(rows.length == emb.count())
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, cs) =>
      val n = cs.head.getLong(4)
      assert(n == cs.length, s"cluster_n mismatch in cluster $cid")
      val keep = cs.count(_.getBoolean(5))
      assert(keep == (n * 5000 + 9999) / 10000,
        s"cluster $cid kept $keep of $n")
      assert(keep >= 1)
      // kept set is exactly the top ranks, and ranks follow dist desc
      val sorted = cs.sortBy(r => (-r.getDouble(2), r.getLong(0)))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(3) == i + 1, s"rank mismatch in cluster $cid")
        assert(r.getBoolean(5) == (i + 1 <= keep))
      }
    }
  }

  // ───────────────────── audio path (q206/q207) ─────────────────────

  test("wav payloads are genuine RIFF/WAVE and the decode replays the model") {
    val d = (1L to 30L).map(Tuple1(_)).toDF("doc_id")
    val payloads = Multimodal.wavPayloads(spark, d)
    payloads.collect().foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
      assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    }
    val got = Multimodal.audioWindowFeatures(spark, payloads, 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // independent JVM replay of the PCM model
    for (id <- 1L to 30L) {
      val cid = if (id % 50 == 49 || id % 50 == 37) id - 24 else id
      val ns = (32 + cid % 97).toInt
      val s = Array.tabulate(ns) { i =>
        val t = (cid * 2654435761L + i * 7919L) % 1000003L
        val u = ((t * t % 1000003L) % 256L).toInt
        (if (id % 50 == 37 && i == 5) (u + 97) % 256 else u) - 128
      }
      val nw = (ns + 31) / 32
      for (w <- 0 until nw) {
        val st = w * 32; val en = math.min(st + 32, ns)
        val sa = (st until en).map(i => math.abs(s(i)).toLong).sum
        val zc = (st + 1 until en)
          .count(i => (s(i) >= 0) != (s(i - 1) >= 0)).toLong
        assert(got((id, w.toLong)) == ((en - st).toLong, sa, zc),
          s"doc $id window $w")
      }
    }
  }

  /** Encode one genuine WAV (8-bit unsigned mono PCM) for the
    * fingerprint tests — the audio analog of [[pngOf]]. */
  private def wavOf(id: Long, samples: Array[Int]): (Long, Array[Byte]) = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val raw = samples.map(u => u.toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    (id, bos.toByteArray)
  }

  test("envelope fingerprint is invariant to sample replication (tempo-stretch analog)") {
    // Haitsma-Kalker robustness: the fingerprint reads the envelope
    // SHAPE through length-relative sub-windows, so a signal and its
    // 2×-replicated stretch (every sample doubled — E(k) scales by 2,
    // delta signs unchanged) must fingerprint identically
    val base = Array.tabulate(32)(i => (40 + (i * i * 7) % 180))
    val stretched = base.flatMap(u => Array(u, u))
    val fps = Multimodal.audioFingerprints(spark,
        Seq(wavOf(1L, base), wavOf(2L, stretched)).toDF("doc_id", "payload"),
        16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fps(1L)._1 == 32L && fps(2L)._1 == 64L)
    assert(fps(1L)._2 == fps(2L)._2,
      s"replicated signal must keep the fingerprint: $fps")
  }

  test("audio class pairs: exact under the cap, star-reduced over it") {
    // 20 classes sharing band 1 (high byte 0): fp = 0..19 — one flooded
    // bucket. Star edges go anchor (fp 0) → member, then the exact
    // hamming verify keeps only bit-count-1 members: fp ∈ {1,2,4,8,16}
    val flood = (0L until 20L).map(fp => (100L + fp, 32L, fp))
      .toDF("doc_id", "n_samples", "fp")
    val starRows = Multimodal.audioClassPairsCapped(flood, 1, 8).collect()
    val star = starRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star == Set((0L, 1L), (0L, 2L), (0L, 4L), (0L, 8L), (0L, 16L)),
      s"flood must star-reduce to the anchor's hamming-1 edges: $star")
    starRows.foreach(r => assert(r.getAs[Long]("hamming") <= 1L))

    // under the cap the 2×8-bit band join is pigeonhole-exact at
    // hamming ≤ 1: compare against the brute-force class-pair truth
    val fps = Seq(5L, 7L, 37L, 36L, 260L, 261L, 300L, 1025L)
      .zipWithIndex.map { case (fp, i) => (i.toLong, 32L, fp) }
      .toDF("doc_id", "n_samples", "fp")
    val got = Multimodal.audioClassPairsCapped(fps, 1, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val distinct = Seq(5L, 7L, 37L, 36L, 260L, 261L, 300L, 1025L)
    val brute = (for {
      a <- distinct; b <- distinct
      if a < b && java.lang.Long.bitCount(a ^ b) <= 1
    } yield (a, b)).toSet
    assert(got == brute, s"got $got expected $brute")
  }

  // ─────────────── streaming quality gate (q208) ───────────────

  test("stateless curation decision ≡ the batch form, edge cases included") {
    // the streaming gate's semantics must never fork from q69's: same
    // decision on every fixture doc AND on the edge shapes the fixture
    // may not contain (empty text, < 3 tokens, all-repeated 3 tokens,
    // double spaces → empty tokens)
    val edge = Seq(
      (9001L, "", "sx", "en"),
      (9002L, "a b", "sx", "en"),
      (9003L, "the the the", "sx", "en"),
      (9004L, "the  of  a  b  c", "sx", "en"))
      .toDF("doc_id", "text", "source", "lang")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val docs = graft.engine.Sources.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"), col("lang"),
        col("n_chars"))
      .union(edge)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("too_short"), col("low_stopword"),
        col("high_repetition"), col("lang_mismatch"), col("keep"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toSet
    val batch = key(TextAnalysis.curationDecision(docs,
      TextAnalysis.stopwords("en"), 5, 0.10, 0.5))
    val stateless = key(TextAnalysis.curationDecisionStateless(docs,
      TextAnalysis.stopwords("en"), 5, 0.10, 0.5))
    assert(stateless == batch)
  }

  // ─────────────── temperature-smoothed mixture (q210) ───────────────

  test("temperature mix boosts low-resource sources; rates match the integer replay") {
    // A: 400 tokens, B: 16 — proportional sampling at budgetDen 2
    // would rate both 5000 bp; √-smoothing must cap tiny B at 10000
    // while A lands at the exact integer formula value
    val docs = ((1 to 50).map(i => (i.toLong, "a b c d e f g h", "A")) ++
      Seq((101L, "a b c d e f g h", "B"), (102L, "a b c d e f g h", "B")))
      .toDF("doc_id", "text", "source")
    val got = DataMix.temperatureMix(docs, 2, "t-spec").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val toks = Map("A" -> 400L, "B" -> 16L)
    val w = toks.view
      .mapValues(t => math.floor(math.sqrt(t.toDouble) * 1000 + 0.5).toLong)
      .toMap
    val bigW = w.values.sum
    val b = (400L + 16L) / 2
    def bp(s: String): Long = math.min(10000L,
      (BigInt(w(s)) * b * 10000 / (BigInt(bigW) * toks(s))).toLong)
    assert(got("A")._3 == bp("A") && got("A")._3 < 5000,
      s"A must be smoothed DOWN from proportional: ${got("A")}")
    assert(got("B")._3 == 10000L, s"tiny B must cap at keep-all: ${got("B")}")
    // rate 10000 keeps every doc: census == kept for B
    assert(got("B")._4 == 2L && got("B")._5 == 16L)
    // kept tokens never exceed census tokens
    got.values.foreach { case (_, nt, _, _, kt) => assert(kt <= nt) }
  }

  // ───────────────── balanced shard plan (q211) ─────────────────

  test("balanced shard plan: partition of the corpus, near-equal token mass") {
    val docs = graft.engine.Sources.table(spark, sfDir, "documents")
    val plan = Sampling.balancedShardPlan(docs, col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))), 8, 32, "shard-v1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(plan.map(_._1).sorted.toSeq == (0L until 8L),
      s"every shard must be populated: ${plan.toSeq}")
    assert(plan.map(_._3).sum == docs.count(),
      "shards must partition the corpus")
    val tokTotal = docs
      .agg(sum(size(graft.functions.TextFns.tokens(col("text")))))
      .collect()(0).getLong(0)
    assert(plan.map(_._4).sum == tokTotal,
      "shard token masses must sum to the census")
    val masses = plan.map(_._4)
    assert(masses.max.toDouble / masses.min <= 1.15,
      s"serpentine LPT-lite must balance within 15%: ${plan.toSeq}")
  }

  test("serpentine beats naive modulo assignment on the fixture") {
    // same micro-buckets, two assignment rules: the snake must produce
    // a spread no worse than shard = bucket % n (the rule it replaces)
    val docs = graft.engine.Sources.table(spark, sfDir, "documents")
    val w = size(graft.functions.TextFns.tokens(col("text")))
    val snake = Sampling.balancedShardPlan(docs, col("doc_id"), w,
        8, 32, "shard-v1")
      .collect().map(_.getLong(3))
    val naive = docs
      .select((Sampling.hashBucket(col("doc_id"), "shard-v1") % 256)
        .mod(8).as("shard"), w.cast("long").as("w"))
      .groupBy(col("shard")).agg(sum(col("w")).as("t"))
      .collect().map(_.getLong(1))
    def spread(a: Array[Long]) = a.max.toDouble / a.min
    assert(spread(snake) <= spread(naive),
      s"snake ${snake.toSeq} vs naive ${naive.toSeq}")
  }
}
