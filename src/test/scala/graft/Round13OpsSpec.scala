package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Round-13: incremental clustering end to end — the contracted
  * connected-components theorem (corpus edges are self-loops under the
  * landed-component contraction, so an increment clusters only its own
  * edges), the per-arm incremental generators (image/audio class
  * edges, embedding LSH pairs), durable CorpusArtifacts handles, and
  * the no-corpus-scan contract of curateIncrement. */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sfDir = "/root/testdata/sf0.001"

  private def edgeSet(df: DataFrame): Set[(Long, Long)] =
    df.select(least(col(df.columns(0)), col(df.columns(1))),
        greatest(col(df.columns(0)), col(df.columns(1))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("contracted CC theorem on a constructed graph: bridges, batch-only components, singleton links") {
    // landed graph: components {1,2}, {3,4}, {10,11}; singleton 7
    // (never in any landed edge). New edges:
    //  - 20 bridges components 1 and 3 (the revocation case)
    //  - 21–22 a batch-only component
    //  - 30 links the landed SINGLETON 7 (not in landedCC at all)
    //  - 31 links component {10,11} via its NON-canonical member 11
    val landedEdges = Seq((1L, 2L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val landedCC = Graph.connectedComponents(landedEdges, "a", "b")
    val newEdges = Seq((20L, 2L), (20L, 4L), (21L, 22L), (30L, 7L),
      (31L, 11L)).toDF("a", "b")
    val full = labelMap(Graph.connectedComponents(
      landedEdges.union(newEdges), "a", "b"))
    val inc = labelMap(Graph.incrementalComponents(landedCC, newEdges,
      "a", "b"))
    // full CC covers every node in any edge; incremental covers landed
    // nodes ∪ new-edge nodes — the same set here except node 7, which
    // the landed clustering never saw but the new edges do
    assert(inc === full,
      s"contracted-CC labels must equal the full merged CC: $inc vs $full")
    // the bridge really merged: 3 and 4's label moved from 3 to 1
    assert(full(3L) === 1L && full(4L) === 1L && full(20L) === 1L)
    assert(full(21L) === 21L && full(22L) === 21L, "batch-only component")
    assert(full(30L) === 7L && full(7L) === 7L, "singleton link")
    assert(full(31L) === 10L, "non-canonical-member link resolves to the root")
  }

  test("contracted CC ≡ full merged CC on the fixture increment (bridges included)") {
    val all = graft.engine.Sources.table(spark, sfDir, "documents")
    val cut = all.agg(max(col("doc_id"))).head().getLong(0) * 4 / 5
    val corpusFps = NearDup.simHash(all.filter(col("doc_id") <= cut))
    val corpusPairs = NearDup.simHashPairsCapped(corpusFps,
        DedupKnobs.SimHashMaxHamming, DedupKnobs.SimHashBucketCap)
      .select(col("doc_a"), col("doc_b"))
    val incPairs = NearDup.incrementalSimhashPairsCapped(corpusFps,
        NearDup.simHash(all.filter(col("doc_id") > cut)),
        DedupKnobs.SimHashMaxHamming, DedupKnobs.SimHashBucketCap)
      .select(col("doc_a"), col("doc_b"))
    val corpusCC = Graph.connectedComponents(corpusPairs, "doc_a", "doc_b")
    val full = labelMap(Graph.connectedComponents(
      corpusPairs.union(incPairs), "doc_a", "doc_b"))
    val inc = labelMap(Graph.incrementalComponents(corpusCC, incPairs,
      "doc_a", "doc_b"))
    assert(inc === full)
    // nonvacuity: the fixture split is known to bridge — some corpus
    // CANONICAL doc loses its label to a smaller component's min
    val corpusLabels = labelMap(corpusCC)
    val bridged = corpusLabels.keys.count(n =>
      corpusLabels(n) == n && full.getOrElse(n, n) != n)
    assert(bridged > 0, "fixture lost its bridges — the theorem test went vacuous")
  }

  test("incremental class edges ≡ the full class arm's batch-touching edges (image + audio, fixture)") {
    val all = graft.engine.Sources.table(spark, sfDir, "documents")
    val cut = all.agg(max(col("doc_id"))).head().getLong(0) * 4 / 5
    val corpus = all.filter(col("doc_id") <= cut)
    val batch = all.filter(col("doc_id") > cut)
    def checkArm(fpsOf: DataFrame => DataFrame, maxHamming: Int,
                 cap: Long, arm: String): Unit = {
      val cFps = fpsOf(corpus).select(col("doc_id"), col("ph_hi"), col("ph_lo"))
      val bFps = fpsOf(batch).select(col("doc_id"), col("ph_hi"), col("ph_lo"))
      val uFps = fpsOf(all).select(col("doc_id"), col("ph_hi"), col("ph_lo"))
      val fullEdges = edgeSet(
        Multimodal.classMemberEdges(uFps, Seq("ph_hi", "ph_lo"), cap)
          .union(Multimodal.resampledClassPairsCapped(uFps, maxHamming, cap)
            .select(col("anchor_a").as("doc_a"), col("anchor_b").as("doc_b"))))
        .filter(_._2 > cut)
      val incEdges = edgeSet(Multimodal.incrementalClassEdgesCapped(
        cFps, bFps, maxHamming, cap))
      assert(incEdges === fullEdges,
        s"$arm: incremental edges must be exactly the batch-touching " +
          s"full-arm edges (inc ${incEdges.size} vs full ${fullEdges.size})")
      assert(incEdges.nonEmpty,
        s"$arm: no planted twins straddle the cut — vacuous")
    }
    checkArm(d => Pipeline.imageFpsOf(spark, d),
      DedupKnobs.PHashMaxHamming, DedupKnobs.PHashClassBucketCap, "image")
    checkArm(d => Pipeline.audioFpsOf(spark, d)
        .select(col("doc_id"), col("fp_hi").as("ph_hi"),
          col("fp_lo").as("ph_lo")),
      DedupKnobs.AudioMbMaxHamming, DedupKnobs.AudioClassBucketCap, "audio")
  }

  test("incremental class edges: union-exact caps in the flood regime (star branches)") {
    // crafted 64-bit classes: base v, plus classes v ^ (1 bit in band-1
    // territory) — all share band 0 (low 16 bits) and bands 2, 3, and
    // pairwise hamming ≤ 2 so the verify never hides a cap decision.
    // cap = 3; corpus holds 2 classes, the batch adds 3 NEW ones →
    // union bucket population 5 > cap: the full generator stars every
    // class to the lexicographic-min class. Also one class (v) gains a
    // batch MEMBER, and one under-cap fresh bucket pair sanity-checks
    // the small path.
    val v = 0x0123456789abL
    def cls(hi: Long, lo: Long, ids: Seq[Long]) =
      ids.map(id => (id, hi, lo))
    val corpusFps = (
      cls(v >> 32, v & 0xffffffffL, Seq(10L, 11L)) ++          // class v
      cls((v ^ (1L << 52)) >> 32 & 0xffffffffL, v & 0xffffffffL, Seq(12L))
    ).toDF("doc_id", "ph_hi", "ph_lo")
    val batchFps = (
      cls(v >> 32, v & 0xffffffffL, Seq(100L)) ++              // member of v
      cls((v >> 32) ^ 1L, v & 0xffffffffL, Seq(101L)) ++       // new class 1
      cls((v >> 32) ^ 2L, v & 0xffffffffL, Seq(102L, 103L)) ++ // new class 2
      cls((v >> 32) ^ 3L, v & 0xffffffffL, Seq(104L))          // new class 3
    ).toDF("doc_id", "ph_hi", "ph_lo")
    val unionFps = corpusFps.unionByName(batchFps)
    val cap = 3L
    val maxHamming = 3
    val fullEdges = edgeSet(
      Multimodal.classMemberEdges(unionFps, Seq("ph_hi", "ph_lo"), cap)
        .union(Multimodal.resampledClassPairsCapped(unionFps, maxHamming, cap)
          .select(col("anchor_a").as("doc_a"), col("anchor_b").as("doc_b"))))
      .filter(_._2 >= 100L)
    val incEdges = edgeSet(Multimodal.incrementalClassEdgesCapped(
      corpusFps, batchFps, maxHamming, cap))
    assert(incEdges === fullEdges, s"flood: $incEdges vs $fullEdges")
    assert(incEdges.nonEmpty, "flood fixture generated no edges — vacuous")
  }

  test("incremental LSH pairs ≡ the full generator's batch-touching pairs (fixture embeddings)") {
    val emb = graft.engine.Sources.table(spark, sfDir, "embeddings")
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 4 / 5
    val corpus = emb.filter(col("vec_id") <= cut)
    val batch = emb.filter(col("vec_id") > cut)
    val k = Pipeline.EmbedKnobs()
    def key(r: Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val full = Similarity.nearDupPairsLsh(emb, k.minCosine, k.planes,
        k.tables, k.bucketCap)
      .filter(col("vec_b") > cut)
      .collect().map(key).toSet
    val inc = Similarity.incrementalNearDupPairsLsh(corpus, batch,
        k.minCosine, k.planes, k.tables, k.bucketCap)
      .collect().map(key).toSet
    assert(inc === full, s"incremental LSH pairs: ${inc.size} vs ${full.size}")
    assert(inc.nonEmpty, "no embedding pairs straddle the cut — vacuous")
  }

  test("curateIncrement issues exactly ONE contracted CC job and never scans the corpus docs") {
    val all = graft.engine.Sources.table(spark, sfDir, "documents")
    val cut = all.agg(max(col("doc_id"))).head().getLong(0) * 4 / 5
    val rates = Map("src1" -> 1.0, "src2" -> 1.0, "src3" -> 0.5,
      "src5" -> 0.8, "src7" -> 1.0, "src11" -> 0.25)
    val (_, art) = Pipeline.curateWithArtifacts(spark,
      all.filter(col("doc_id") <= cut), rates, "inc-v3", None)
    // poison every artifact curateIncrement must NOT consume: a frame
    // that throws on ANY execution. The corpus document table and the
    // landed pair table must never enter an increment's job.
    def poison(schema: org.apache.spark.sql.types.StructType): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq.empty[Row], 2)
          .mapPartitions[Row](_ =>
            throw new RuntimeException("poisoned artifact was scanned")),
        schema)
    val poisoned = art.copy(exact = poison(art.exact.schema),
      pairs = poison(art.pairs.schema),
      published = poison(art.published.schema))
    val cc0 = Graph.ccRuns.get()
    val (incMixed, _, counts) = Pipeline.curateIncrement(
      spark, poisoned, all.filter(col("doc_id") > cut), rates, "inc-v3")
    val ccDelta = Graph.ccRuns.get() - cc0
    assert(ccDelta === 1L,
      s"an increment must cluster ONCE, over contracted edges only: $ccDelta")
    assert(counts.revokedCorpusDocs > 0L,
      "this fixture split is known to bridge; the contracted-label " +
        "revocation audit must see it")
    assert(incMixed.count() > 0)
  }

  test("curateIncrement revocation audit equals the round-12 full-CC definition") {
    val all = graft.engine.Sources.table(spark, sfDir, "documents")
    val cut = all.agg(max(col("doc_id"))).head().getLong(0) * 4 / 5
    val rates = Map("src1" -> 1.0, "src2" -> 1.0, "src3" -> 0.5,
      "src5" -> 0.8, "src7" -> 1.0, "src11" -> 0.25)
    val (_, art) = Pipeline.curateWithArtifacts(spark,
      all.filter(col("doc_id") <= cut), rates, "inc-v4", None)
    val (_, _, counts) = Pipeline.curateIncrement(
      spark, art, all.filter(col("doc_id") > cut), rates, "inc-v4")
    // the round-12 definition, replayed independently: corpus near-dup
    // survivors whose node appears in the FULL merged CC with a
    // different label. The batch's exact stage replays inline (default
    // QualityKnobs, landed key set anti-join).
    val batch = all.filter(col("doc_id") > cut)
    val quality = batch.join(
      TextAnalysis.curationDecision(batch, TextAnalysis.stopwords("en"),
        minTokens = 5, minStopRatio = 0.05, maxRepRatio = 0.6)
        .filter(col("keep")).select(col("doc_id")), "doc_id")
    val exactB = graft.engine.Dedup.latestByKey(
        quality.withColumn("__key",
          md5(TextAnalysis.normalizeText(col("text")))),
        keys = Seq("__key"), orderBy = Seq(-col("doc_id")))
      .join(art.exactKeys, Seq("__key"), "left_anti").drop("__key")
    val incPairs = NearDup.incrementalSimhashPairsCapped(art.textFps,
        NearDup.simHash(exactB),
        DedupKnobs.SimHashMaxHamming, DedupKnobs.SimHashBucketCap)
      .select(col("doc_a"), col("doc_b"))
    val merged = Graph.connectedComponents(
      art.pairs.union(incPairs), "doc_a", "doc_b")
    val survivorIds = art.exact.select(col("doc_id"))
      .join(art.clusters.filter(col("n") =!= col("component"))
        .select(col("n").as("doc_id")), Seq("doc_id"), "left_anti")
    val expected = survivorIds
      .join(merged.filter(col("n") =!= col("component"))
        .select(col("n").as("doc_id")), Seq("doc_id"))
      .count()
    assert(counts.revokedCorpusDocs === expected)
  }

  test("durable artifacts round-trip: a FRESH session increments from landed parquet alone") {
    val all = graft.engine.Sources.table(spark, sfDir, "documents")
    val cut = all.agg(max(col("doc_id"))).head().getLong(0) * 4 / 5
    val rates = Map("src1" -> 1.0, "src2" -> 1.0, "src3" -> 0.5,
      "src5" -> 0.8, "src7" -> 1.0, "src11" -> 0.25)
    val (_, art) = Pipeline.curateWithArtifacts(spark,
      all.filter(col("doc_id") <= cut), rates, "inc-v5", None)
    val (memMixed, memManifest, memCounts) = Pipeline.curateIncrement(
      spark, art, all.filter(col("doc_id") > cut), rates, "inc-v5")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_artifacts_").toString
    try {
      Pipeline.writeArtifacts(art, dir)
      // a fresh session: new catalog/conf over the shared context —
      // the closest a test JVM gets to "a new daily driver process"
      val fresh = spark.newSession()
      val art2 = Pipeline.readArtifacts(fresh, dir)
      assert(art2.maxDocId === art.maxDocId)
      val (mixed2, manifest2, counts2) = Pipeline.curateIncrement(
        fresh, art2,
        graft.engine.Sources.table(fresh, sfDir, "documents")
          .filter(col("doc_id") > cut),
        rates, "inc-v5")
      assert(counts2 === memCounts)
      val ids = (df: DataFrame) => df.select(col("doc_id")).collect()
        .map(_.getLong(0)).toSet
      assert(ids(mixed2) === ids(memMixed))
      def mkey(r: Row) = (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(manifest2.orderBy(col("split"), col("source")).collect()
        .map(mkey).toSeq ===
        memManifest.orderBy(col("split"), col("source")).collect()
          .map(mkey).toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  test("multimodal curateIncrement: batch slice ≡ the full multimodal rerun's batch slice") {
    val all = graft.engine.Sources.table(spark, sfDir, "documents")
    val cut = all.agg(max(col("doc_id"))).head().getLong(0) * 4 / 5
    val rates = Map("src1" -> 1.0, "src2" -> 1.0, "src3" -> 0.5,
      "src5" -> 0.8, "src7" -> 1.0, "src11" -> 0.25)
    val (_, art) = Pipeline.curateWithArtifacts(spark,
      all.filter(col("doc_id") <= cut), rates, "inc-v6", None,
      multimodal = true)
    assert(art.imageFps.isDefined && art.audioFps.isDefined)
    val (incMixed, _, counts) = Pipeline.curateIncrement(
      spark, art, all.filter(col("doc_id") > cut), rates, "inc-v6",
      multimodal = true)
    val (_, artFull) = Pipeline.curateWithArtifacts(spark, all,
      rates, "inc-v6", None, multimodal = true)
    val incIds = incMixed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val fullBatchIds = artFull.published.filter(col("doc_id") > cut)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(incIds === fullBatchIds,
      "multimodal increment must publish exactly the full rerun's batch slice")
    assert(counts.afterNearDup < counts.afterExact,
      "vacuous: the multimodal arms dropped nothing from the batch")
  }

  test("judgeBucket flood: bounded intake ≡ full sort when sorted/under-chunk; invariants under adversarial order") {
    import graft.streaming.NearDupStream.{BandDoc, BandMatch, Member}
    def doc(id: Long) = BandDoc(0, 0L, id, 0L, 0L) // identical fps: hamming 0
    def run(rows: Seq[BandDoc], chunk: Int,
            cap: Int = 8): (Seq[BandMatch], List[Member]) = {
      var last: List[Member] = Nil
      val out = graft.streaming.NearDupStream.judgeBucket(rows.iterator,
        Nil, cap, 3, chunk, ms => last = ms).toSeq
      (out, last)
    }
    val n = 1000
    val sorted = (1L to n).map(doc)
    val (ref, refM) = run(sorted, chunk = n + 1) // the old one-shot form
    assert(ref.head === BandMatch(1L, None))
    assert(ref.tail.forall(_.dup_of.contains(1L)))
    // sorted arrival + tiny chunks (the monotone-ingest contract):
    // verdicts AND final state identical to the full sort — memory is
    // O(chunk + cap) by construction (the buffer never exceeds chunk)
    val (chunked, chM) = run(sorted, chunk = 7)
    assert(chunked === ref)
    assert(chM.map(_.doc_id).sorted === refM.map(_.doc_id).sorted)
    // unsorted arrival, single chunk: the in-chunk sort restores the
    // full-sort semantics exactly
    val shuffled = new scala.util.Random(13).shuffle(sorted)
    val (oneChunk, _) = run(shuffled, chunk = n + 1)
    assert(oneChunk === ref)
    // adversarial: unsorted arrival THROUGH tiny chunks — the
    // documented degradation can only MISS a dedup, never invert one:
    // every verdict emitted, state capped, dup_of strictly earlier,
    // and the global first-seen doc is never flagged
    val (adv, advM) = run(shuffled, chunk = 7)
    assert(adv.size === n)
    assert(advM.size <= 8)
    adv.foreach(v => v.dup_of.foreach(d => assert(d < v.doc_id)))
    assert(adv.find(_.doc_id == 1L).get.dup_of.isEmpty)
  }

  test("increments CHAIN: day 2 lands on day 1's updated artifacts; clustering advances exactly") {
    def t(i: Long, words: String) = (i, s"the $words of it", "src1",
      (s"the $words of it").length.toLong, "en")
    val rep = (w: String) => s"the $w of it the $w of it"
    val all = Seq(
      t(0L, "aa ab ac ad ae"), t(1L, "ba bb bc bd be"),
      t(2L, "ca cb cc cd ce"), t(3L, "da db dc dd de"),
      t(4L, "ea eb ec ed ee"),
      // day-1 batch (ids 10..14)
      t(10L, "fa fb fc fd fe"),
      (11L, "the da db dc dd de of it", "src1", 26L, "en"), // exact twin of 3
      t(13L, "ga gb gc gd ge"),
      // day-2 batch (ids 20..24): a corpus twin, a DAY-1 twin, an
      // in-batch twin — each stage of the chained landed truth
      (21L, "the ca cb cc cd ce of it", "src1", 26L, "en"), // exact twin of 2
      (22L, rep("ga gb gc gd ge"), "src1",
        rep("ga gb gc gd ge").length.toLong, "en"),         // simhash twin of 13
      t(20L, "ha hb hc hd he"), t(23L, "ia ib ic id ie"),
      (24L, rep("ia ib ic id ie"), "src1",
        rep("ia ib ic id ie").length.toLong, "en"))         // simhash twin of 23
      .toDF("doc_id", "text", "source", "n_chars", "lang")
    val rates = Map("src1" -> 1.0)
    val loose = Pipeline.QualityKnobs(minTokens = 1, minStopRatio = 0.0,
      maxRepRatio = 1.0)
    val (_, art0) = Pipeline.curateWithArtifacts(spark,
      all.filter(col("doc_id") <= 4), rates, "inc-v8", None, knobs = loose)
    val ((mixed1, _, _), art1) = Pipeline.curateIncrementWithArtifacts(
      spark, art0, all.filter(col("doc_id") >= 10 && col("doc_id") <= 14),
      rates, "inc-v8", knobs = loose)
    assert(mixed1.select(col("doc_id")).collect().map(_.getLong(0)).toSet
      === Set(10L, 13L))
    assert(art1.maxDocId === 13L)
    val ((mixed2, manifest2, _), art2) = Pipeline.curateIncrementWithArtifacts(
      spark, art1, all.filter(col("doc_id") >= 20), rates, "inc-v8",
      knobs = loose)
    val ids2 = mixed2.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids2 === Set(20L, 23L),
      s"planted day-2 fates: 21 exact-twins corpus 2, 22 near-dups " +
        s"DAY-1's 13, 24 twins 23 in-batch: $ids2")
    // the chained merged manifest ≡ the full-rebuild manifest
    // (bridge-free, under-cap fixture — the regime where landed truth
    // and a rebuild provably coincide)
    val (_, artFull) = Pipeline.curateWithArtifacts(spark, all, rates,
      "inc-v8", None, knobs = loose)
    def mkey(r: Row) = (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5))
    val full = DataMix.manifestFromCells(artFull.cells,
      budgetDen = 1, capEpochs = 2).collect().map(mkey).toSeq
    assert(manifest2.collect().map(mkey).toSeq === full)
    // artifact advance is EXACT: day-2's landed clustering equals a
    // from-scratch CC over day-2's landed pair table (tomorrow's
    // contraction base satisfies its own theorem's premise)
    val fresh = Graph.connectedComponents(art2.pairs, "doc_a", "doc_b")
    assert(labelMap(art2.clusters) === labelMap(fresh))
  }

  test("wide frame-matrix fingerprint: words 0..3 ARE the multi-band fingerprint; planted twins pair") {
    val d = (1L to 120L).map(Tuple1(_)).toDF("doc_id")
    val payloads = Multimodal.wavPayloads(spark, d)
    val mb = Multimodal.audioFingerprintsMultiBand(spark, payloads,
        DedupKnobs.AudioFpSubWindows, DedupKnobs.AudioFpBands)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val words = DedupKnobs.AudioFpWideWords
    val wide = Multimodal.audioFingerprintsWide(spark, payloads,
        DedupKnobs.AudioFpSubWindows, DedupKnobs.AudioFpWideBands,
        DedupKnobs.AudioFpWideWordBits)
      .collect().map(r => r.getLong(0) ->
        (2 until 2 + words).map(r.getLong).toIndexedSeq).toMap
    (1L to 120L).foreach { id =>
      val (hi, lo) = mb(id)
      val w = wide(id)
      // 15-bit words tile the matrix: bands 0..3 occupy bits 0..59 =
      // words 0..3 exactly, and those bits ARE the multi-band form
      val v60 = w(0) | (w(1) << 15) | (w(2) << 30) | (w(3) << 45)
      assert(v60 === ((hi << 32) | lo),
        s"doc $id: wide words 0..3 must reproduce the 60-bit multiband form")
      w.foreach(x => assert(x >= 0 && x < (1L << 15), "15-bit word domain"))
    }
    // class pairs over the fixture corpus: the planted near twins
    // (doc ≡ 37 mod 50 carries doc−24's recording, one sample bumped)
    // must surface as anchor pairs 24 apart within the wide threshold
    val fps = Multimodal.audioFingerprintsWide(spark,
      Multimodal.wavPayloads(spark,
        graft.engine.Sources.table(spark, sfDir, "documents")),
      DedupKnobs.AudioFpSubWindows, DedupKnobs.AudioFpWideBands,
      DedupKnobs.AudioFpWideWordBits)
    val pairs = Multimodal.wideClassPairsCapped(fps,
      (0 until words).map(j => s"w$j"),
      DedupKnobs.AudioWideMaxHamming, DedupKnobs.AudioClassBucketCap)
    val twinPairs = pairs.filter(abs(col("anchor_b") - col("anchor_a"))
      === 24).count()
    assert(twinPairs > 0, "planted audio near twins must pair at the wide width")
    assert(pairs.filter(col("hamming") > DedupKnobs.AudioWideMaxHamming)
      .isEmpty, "verify threshold")
  }

  /** The Round12 bridge-free increment fixture plus synthetic
    * embeddings: doc 13 (batch, survives text dedup) carries a vector
    * nearly parallel to doc 0's (corpus) — the semantic twin the
    * embedding arm must drop; doc 10's vector is orthogonal to
    * everything and survives. */
  test("embedding curateIncrement: batch slice ≡ the full rerun's (prune-free)") {
    def t(i: Long, words: String) = (i, s"the $words of it", "src1",
      (s"the $words of it").length.toLong, "en")
    val rep = (w: String) => s"the $w of it the $w of it"
    val all = Seq(
      t(0L, "aa ab ac ad ae"), t(1L, "ba bb bc bd be"),
      t(2L, "ca cb cc cd ce"), t(3L, "da db dc dd de"),
      t(4L, "ea eb ec ed ee"),
      t(8L, "fa fb fc fd fe"), t(9L, "ga gb gc gd ge"),
      t(10L, "ha hb hc hd he"), t(13L, "ia ib ic id ie"))
      .toDF("doc_id", "text", "source", "n_chars", "lang")
    def unit(i: Int): Seq[Float] =
      Seq.tabulate(8)(j => if (j == i) 1.0f else 0.0f)
    val emb = Seq(
      (0L, unit(0)), (1L, unit(1)), (2L, unit(2)), (3L, unit(3)),
      (4L, unit(4)), (8L, unit(5)), (9L, unit(6)), (10L, unit(7)),
      (13L, Seq.tabulate(8)(j =>
        if (j == 0) 1.0f else if (j == 1) 0.02f else 0.0f)))
      .toDF("vec_id", "embedding")
    val rates = Map("src1" -> 1.0)
    val loose = Pipeline.QualityKnobs(minTokens = 1, minStopRatio = 0.0,
      maxRepRatio = 1.0)
    val pruneFree = Pipeline.EmbedKnobs(keepBp = 10000)
    val corpusDocs = all.filter(col("doc_id") <= 9)
    val batchDocs = all.filter(col("doc_id") > 9)
    val (_, art) = Pipeline.curateWithArtifacts(spark, corpusDocs,
      rates, "inc-v7", None, knobs = loose,
      embeddings = Some(emb.filter(col("vec_id") <= 9)),
      embedKnobs = pruneFree)
    assert(art.embVecs.isDefined && art.vecClusters.isDefined)
    val (incMixed, _, counts) = Pipeline.curateIncrement(
      spark, art, batchDocs, rates, "inc-v7", knobs = loose,
      embeddings = Some(emb.filter(col("vec_id") > 9)),
      embedKnobs = pruneFree)
    val (_, artFull) = Pipeline.curateWithArtifacts(spark, all,
      rates, "inc-v7", None, knobs = loose,
      embeddings = Some(emb), embedKnobs = pruneFree)
    val incIds = incMixed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val fullBatchIds = artFull.published.filter(col("doc_id") > 9)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(incIds === fullBatchIds)
    assert(incIds === Set(10L),
      s"doc 13 is a planted semantic twin of doc 0 and must drop: $incIds")
    assert(counts.afterEmbedding === 1L)
  }
}
