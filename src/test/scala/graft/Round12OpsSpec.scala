package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Round-12: the multi-band Haitsma-Kalker audio fingerprint (the
  * production-width signal that replaces the saturating ≤31-bit
  * envelope in the pipeline's audio arm) and the entropy-raised
  * payload models with PLANTED cross-modal twins (image: doc ≡ 27
  * mod 50 carries doc−27's payload; audio: doc ≡ 49 mod 50 carries
  * doc−24's recording). */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sfDir = "/root/testdata/sf0.001"

  test("multi-band fingerprint with bands = 1 IS the envelope fingerprint") {
    val d = (1L to 120L).map(Tuple1(_)).toDF("doc_id")
    val payloads = Multimodal.wavPayloads(spark, d)
    val env = Multimodal.audioFingerprints(spark, payloads,
        DedupKnobs.AudioFpSubWindows)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val mb = Multimodal.audioFingerprintsMultiBand(spark, payloads,
        DedupKnobs.AudioFpSubWindows, bands = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    (1L to 120L).foreach { id =>
      assert(mb(id) === ((0L, env(id))),
        s"doc $id: B=1 must reproduce the envelope bits in fp_lo")
    }
  }

  test("multi-band fingerprint reproduces the JVM band-energy replay bit for bit") {
    val sw = DedupKnobs.AudioFpSubWindows
    val nb = DedupKnobs.AudioFpBands
    val d = (1L to 60L).map(Tuple1(_)).toDF("doc_id")
    val got = Multimodal.audioFingerprintsMultiBand(spark,
        Multimodal.wavPayloads(spark, d), sw, nb)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // independent JVM replay: PCM model → per-sub-window band energies
    // (band 0 = Σ|s|, band b = Σ|s(i) − s(i−b)| over i ≥ b) →
    // sign-of-delta bits at (k + b·(S−1))
    def expected(id: Long): (Long, Long, Long) = {
      val cid = if (id % 50 == 49 || id % 50 == 37) id - 24 else id
      val ns = (32 + cid % 97).toInt
      val s = Array.tabulate(ns) { i =>
        val t = (cid * 2654435761L + i * 7919L) % 1000003L
        val u = ((t * t % 1000003L) % 256L).toInt
        (if (id % 50 == 37 && i == 5) (u + 97) % 256 else u) - 128
      }
      val e = Array.ofDim[Long](nb, sw)
      for (i <- 0 until ns) {
        val w = (i.toLong * sw / ns).toInt
        e(0)(w) += math.abs(s(i))
        for (b <- 1 until nb if i >= b) e(b)(w) += math.abs(s(i) - s(i - b))
      }
      var hi = 0L
      var lo = 0L
      for (b <- 0 until nb; k <- 0 until sw - 1 if e(b)(k + 1) > e(b)(k)) {
        val bit = b * (sw - 1) + k
        if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
      }
      (ns.toLong, hi, lo)
    }
    for (id <- 1L to 60L) assert(got(id) == expected(id), s"doc $id")
  }

  test("planted audio twins: doc ≡ 49 (mod 50) carries its donor's exact bytes") {
    val d = Seq(25L, 49L, 75L, 99L, 26L).map(Tuple1(_)).toDF("doc_id")
    val bytes = Multimodal.wavPayloads(spark, d).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq).toMap
    assert(bytes(49L) === bytes(25L), "doc 49 must carry doc 25's recording")
    assert(bytes(99L) === bytes(75L), "doc 99 must carry doc 75's recording")
    assert(bytes(26L) !== bytes(25L), "a non-plant keeps its own recording")
  }

  test("multi-band signal census on the fixture: planted pairs are the only collisions") {
    val docs = graft.engine.Sources.table(spark, sfDir, "documents")
    val mb = Multimodal.audioFingerprintsMultiBand(spark,
      Multimodal.wavPayloads(spark, docs),
      DedupKnobs.AudioFpSubWindows, DedupKnobs.AudioFpBands)
    val row = Multimodal.signalSaturation(mb, Seq("fp_hi", "fp_lo"),
        "audio_multiband", DedupKnobs.AudioClassBucketCap)
      .collect().head
    val (items, classes, maxClass, saturated) =
      (row.getLong(1), row.getLong(2), row.getLong(3), row.getBoolean(4))
    // collisions = the exact twins (≡ 49) plus the near twins (≡ 37)
    // whose one-sample bump happened not to flip any bit (hamming 0 —
    // they join the donor's class); compute the exact expectation from
    // the fingerprints themselves
    val fp = mb.collect().map(r => r.getLong(0) ->
      (r.getLong(2), r.getLong(3))).toMap
    val nExact = fp.keys.count(_ % 50 == 49)
    val nNearH0 = fp.keys.count(id =>
      id % 50 == 37 && fp.contains(id - 24) && fp(id) == fp(id - 24))
    assert(!saturated && maxClass === 2L,
      s"multi-band must not birthday-collide at fixture scale: $row")
    assert(classes === items - nExact - nNearH0,
      s"every collision must be a planted twin: $row, " +
        s"exact=$nExact nearH0=$nNearH0")
  }

  test("multimodal pair union carries the planted image and audio twins as edges") {
    // texts are all DISTINCT and dissimilar, so the text arm pairs
    // nothing; the only edges must come from the planted payload twins
    // (image: 0–27, audio: 25–49)
    val words = Seq("alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two three four five six seven eight nine ten",
      "red blue green yellow purple orange cyan magenta lime teal",
      "cat dog bird fish horse sheep goat cow duck hen",
      "north south east west up down left right front back")
    val docs = Seq(0L, 25L, 27L, 49L, 60L).zip(words)
      .map { case (id, t) => (id, t) }.toDF("doc_id", "text")
    val pairs = Pipeline.multimodalPairs(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 27L)),
      s"image twin edge (0, 27) missing from $pairs")
    assert(pairs.contains((25L, 49L)),
      s"audio twin edge (25, 49) missing from $pairs")
    assert(!pairs.exists { case (a, b) =>
      Set(a, b) != Set(0L, 27L) && Set(a, b) != Set(25L, 49L) },
      s"no non-planted edge may appear: $pairs")
  }

  test("audio online dedup: stream verdicts equal the batch retained-member rule") {
    val sfd = sfDir
    val got = graft.streaming.NearDupStream.runOnlineAudioDedupOnce(spark,
        sfd, DedupKnobs.AudioMbMaxHamming, DedupKnobs.AudioClassBucketCap.toInt)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // independent batch replay of the first-cap-arrivals rule over the
    // multi-band band table (the q220 oracle's shape, via the engine's
    // own batch fingerprint operator)
    import org.apache.spark.sql.expressions.Window
    val docs = graft.engine.Sources.table(spark, sfd, "documents")
    val fps = Multimodal.audioFingerprintsMultiBand(spark,
      Multimodal.wavPayloads(spark, docs),
      DedupKnobs.AudioFpSubWindows, DedupKnobs.AudioFpBands)
    val ab = fps.select(col("doc_id"), col("fp_hi"), col("fp_lo"),
        explode(NearDup.band64(col("fp_hi"), col("fp_lo"))).as("x"))
      .select(col("doc_id"), col("fp_hi"), col("fp_lo"),
        col("x.band").as("band"), col("x.bv").as("bv"))
    val held = ab.withColumn("r", row_number().over(
        Window.partitionBy(col("band"), col("bv")).orderBy(col("doc_id"))))
      .filter(col("r") <= DedupKnobs.AudioClassBucketCap)
    val expected = ab.as("x").join(held.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
        col("y.doc_id") < col("x.doc_id") &&
        (bit_count(col("x.fp_hi").bitwiseXOR(col("y.fp_hi"))) +
         bit_count(col("x.fp_lo").bitwiseXOR(col("y.fp_lo"))))
          <= DedupKnobs.AudioMbMaxHamming)
      .groupBy(col("x.doc_id")).agg(min(col("y.doc_id")).as("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, (isDup, dupOf)) =>
      assert(isDup === expected.contains(id), s"doc $id verdict")
      if (isDup) assert(dupOf === expected(id), s"doc $id dup_of")
    }
    // the planted exact twins MUST be caught, pointing at their donors
    val exactTwins = got.keys.filter(_ % 50 == 49)
    assert(exactTwins.nonEmpty && exactTwins.forall(id =>
      got(id) == ((true, id - 24))), "exact audio twins must stream-dedup")
  }

  test("native simhash64 expression ≡ the HOF form ≡ the batch aggregation") {
    val docs = graft.engine.Sources.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
    def byDoc(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val native = byDoc(docs.select(col("doc_id"),
        NearDup.simHash64Row(col("text")).as("fp"))
      .select(col("doc_id"), col("fp.fp_hi"), col("fp.fp_lo")))
    val hof = byDoc(docs.select(col("doc_id"),
        NearDup.simHash64RowHof(col("text")).as("fp"))
      .select(col("doc_id"), col("fp.fp_hi"), col("fp.fp_lo")))
    val batch = byDoc(NearDup.simHash64(docs))
    assert(native === hof, "native expression must equal the HOF reference")
    assert(native === batch, "in-row fingerprint must equal the batch form")
    // split semantics corner: empty text still votes one empty token
    val e = Seq((1L, ""), (2L, "a "), (3L, " ")).toDF("doc_id", "text")
    val ne = byDoc(e.select(col("doc_id"),
        NearDup.simHash64Row(col("text")).as("fp"))
      .select(col("doc_id"), col("fp.fp_hi"), col("fp.fp_lo")))
    val he = byDoc(e.select(col("doc_id"),
        NearDup.simHash64RowHof(col("text")).as("fp"))
      .select(col("doc_id"), col("fp.fp_hi"), col("fp.fp_lo")))
    assert(ne === he, "empty/trailing-token split semantics must agree")
  }

  test("incremental simhash pairs ≡ the full recompute's new pairs (fixture)") {
    val all = graft.engine.Sources.table(spark, sfDir, "documents")
    val cut = all.agg(max(col("doc_id"))).head().getLong(0) * 4 / 5
    val corpus = all.filter(col("doc_id") <= cut)
    val batch = all.filter(col("doc_id") > cut)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val full = NearDup.simHashPairsCapped(NearDup.simHash(all),
        DedupKnobs.SimHashMaxHamming, DedupKnobs.SimHashBucketCap)
      .filter(col("doc_b") > cut)
      .collect().map(key).toSet
    val inc = NearDup.incrementalSimhashPairsCapped(
        NearDup.simHash(corpus), NearDup.simHash(batch),
        DedupKnobs.SimHashMaxHamming, DedupKnobs.SimHashBucketCap)
      .collect().map(key).toSet
    assert(inc === full, "incremental pairs must be exactly the new pairs")
    assert(inc.nonEmpty, "vacuous equivalence — fixture lost its pairs")
  }

  test("incremental simhash pairs: union-exact caps in the flood regime") {
    // 12 identical docs straddling the cut (ids 1..9 corpus, 10..12
    // batch): every band bucket holds all 12 > cap 8, so the full
    // recompute stars everyone to doc 1 — the increment must emit
    // exactly the batch members' star edges (1,10), (1,11), (1,12),
    // even though the BATCH-only bucket population (3) is under the
    // cap: the cap is a union property, not a side property
    val text = "spark join window merge sort filter group order"
    val mk = (ids: Seq[Long]) => ids.map(i => (i, text)).toDF("doc_id", "text")
    val inc = NearDup.incrementalSimhashPairsCapped(
        NearDup.simHash(mk(1L to 9L)), NearDup.simHash(mk(10L to 12L)),
        DedupKnobs.SimHashMaxHamming, DedupKnobs.SimHashBucketCap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc === Set((1L, 10L), (1L, 11L), (1L, 12L)),
      s"flooded union bucket must star batch members to the corpus anchor: $inc")
  }

  test("curateIncrement on the fixture: batch slice ≡ full rerun; bridges detected") {
    val all = graft.engine.Sources.table(spark, sfDir, "documents")
    val cut = all.agg(max(col("doc_id"))).head().getLong(0) * 4 / 5
    val corpusDocs = all.filter(col("doc_id") <= cut)
    val batchDocs = all.filter(col("doc_id") > cut)
    val rates = Map("src1" -> 1.0, "src2" -> 1.0, "src3" -> 0.5,
      "src5" -> 0.8, "src7" -> 1.0, "src11" -> 0.25)
    val (c1, art) = Pipeline.curateWithArtifacts(spark, corpusDocs,
      rates, "inc-v1", None)
    val (incMixed, _, counts) = Pipeline.curateIncrement(
      spark, art, batchDocs, rates, "inc-v1")
    val (cf, artFull) = Pipeline.curateWithArtifacts(spark, all,
      rates, "inc-v1", None)
    // BATCH-SLICE equivalence — unconditional (bridges change corpus
    // docs' fate, never a batch doc's): the increment's published docs
    // are exactly the full rerun's published docs above the cut
    val incIds = incMixed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val fullBatchIds = artFull.published.filter(col("doc_id") > cut)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(incIds === fullBatchIds,
      "increment must publish exactly the full rerun's batch slice")
    // REVOCATION detection: the fixture genuinely bridges (batch docs
    // connecting two corpus clusters) — the detector must see it.
    // (No corpus-side survivor arithmetic is asserted: a full rerun
    // also RE-DRAWS cap boundaries — a bucket under the cap at the
    // corpus size can exceed it at the union size, and the
    // star-verified edge set is not connectivity-equivalent to the
    // all-pairs one — so corpus docs' fates legitimately differ
    // between the landed tables and a from-scratch rebuild. The
    // increment's contract is the landed truth + the batch slice,
    // both pinned here; cf is computed only as the slice reference.)
    assert(counts.revokedCorpusDocs > 0L,
      "this fixture split is known to bridge; the detector must see it")
    assert(cf.afterNearDup > 0 && c1.afterNearDup > 0)
  }

  /** Controlled increment corpus: unique-vocabulary docs (no organic
    * pairs), one exact twin and one simhash twin crossing the cut, one
    * twin pair inside each side — and NO bridges. The simhash twins
    * are text REPETITIONS: doubling every token doubles every bit's
    * vote sum, so the fingerprint is IDENTICAL (hamming 0) while the
    * normalized text differs (survives exact dedup) — a deterministic
    * near-dup plant needing no hamming luck. */
  private def incFixture = {
    def t(i: Long, words: String) = (i, s"the $words of it", "src1",
      (s"the $words of it").length.toLong, "en")
    val rep = (w: String) => s"the $w of it the $w of it"
    Seq(
      t(0L, "aa ab ac ad ae"), t(1L, "ba bb bc bd be"),
      t(2L, "ca cb cc cd ce"), t(3L, "da db dc dd de"),
      t(4L, "ea eb ec ed ee"),
      (7L, rep("ca cb cc cd ce"), "src1",
        rep("ca cb cc cd ce").length.toLong, "en"),  // simhash twin of 2
      t(8L, "fa fb fc fd fe"), t(9L, "ga gb gc gd ge"),
      // batch side (ids > 9)
      t(10L, "ha hb hc hd he"),
      (11L, "the da db dc dd de of it", "src1", 26L, "en"), // exact twin of 3
      (12L, rep("ea eb ec ed ee"), "src1",
        rep("ea eb ec ed ee").length.toLong, "en"),  // simhash twin of 4
      t(13L, "ia ib ic id ie"),
      (14L, rep("ia ib ic id ie"), "src1",
        rep("ia ib ic id ie").length.toLong, "en"))  // simhash twin of 13
      .toDF("doc_id", "text", "source", "n_chars", "lang")
  }

  test("curateIncrement on a bridge-free corpus: merged manifest ≡ the full rerun's") {
    val all = incFixture
    val corpusDocs = all.filter(col("doc_id") <= 9)
    val batchDocs = all.filter(col("doc_id") > 9)
    val rates = Map("src1" -> 1.0)
    val loose = Pipeline.QualityKnobs(minTokens = 1, minStopRatio = 0.0,
      maxRepRatio = 1.0)
    val (c1, art) = Pipeline.curateWithArtifacts(spark, corpusDocs,
      rates, "inc-v2", None, knobs = loose)
    val (incMixed, mergedManifest, counts) = Pipeline.curateIncrement(
      spark, art, batchDocs, rates, "inc-v2", knobs = loose)
    val (cf, artFull) = Pipeline.curateWithArtifacts(spark, all,
      rates, "inc-v2", None, knobs = loose)
    assert(counts.revokedCorpusDocs === 0L, s"constructed bridge-free: $counts")
    // planted fates: 11 exact-dropped (twin of 3), 12 near-dup-dropped
    // (fingerprint ≡ 4's), 14 dropped to 13; 10 and 13 survive
    val incIds = incMixed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    assert(incIds === Set(10L, 13L), s"batch survivors: $incIds")
    assert(counts.afterMix === cf.afterMix - c1.afterMix,
      s"inc=$counts corpus=$c1 full=$cf")
    // merged manifest ≡ full rerun manifest, row for row
    def mkey(r: org.apache.spark.sql.Row) = (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
    val full = graft.operators.DataMix
      .manifestFromCells(artFull.cells, budgetDen = 1, capEpochs = 2)
      .collect().map(mkey).toSeq
    assert(mergedManifest.collect().map(mkey).toSeq === full)
  }
}
