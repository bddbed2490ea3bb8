package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Sources
import graft.operators._

/** Tests for the corpus-planning operators ([[graft.operators.DataMix]])
  * and hybrid RRF retrieval ([[graft.operators.Retrieval.hybridRrf]]):
  * closed-form expectations on literal frames, and the leakage
  * invariant on the sf0.001 fixtures. */
class DataMixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sfDir = "/root/testdata/sf0.001"

  /** The engine's term bucket, replicated independently in pure JVM
    * code (md5 → first 8 hex digits → % buckets). */
  private def bucketOf(term: String, buckets: Int, salt: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((term + salt).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % buckets
  }

  test("hybridRrf: closed-form RRF scores, full-outer membership, rank coalescing") {
    val docs = Seq(
      1L -> "spark join query engine",
      2L -> "spark only here",
      3L -> "nothing relevant at all").toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f)),   // probe
      (1L, Array(1f, 0f)),   // cos 1.0  -> vec rank 1
      (2L, Array(0.8f, 0.6f)), // cos 0.8 -> vec rank 2
      (3L, Array(0f, 1f)))   // cos 0.0  -> vec rank 3
      .toDF("vec_id", "embedding")
    val out = Retrieval.hybridRrf(docs, emb, Seq("spark", "join"),
      probeVecId = 0L, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList
    // lexical: doc 1 matches 2 terms (rank 1), doc 2 one term (rank 2);
    // vector top-2: doc 1 (rank 1), doc 2 (rank 2); doc 3 in neither
    def rrf(rl: Long, rv: Long): Double = {
      val s = (if (rl > 0) 1.0 / (60 + rl) else 0.0) +
        (if (rv > 0) 1.0 / (60 + rv) else 0.0)
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out == List(
      (1L, 1L, 1L, rrf(1, 1)),
      (2L, 2L, 2L, rrf(2, 2))))
    // widen k: doc 3 enters the vector list only — lex rank coalesces to 0
    val out3 = Retrieval.hybridRrf(docs, emb, Seq("spark", "join"),
      probeVecId = 0L, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList
    assert(out3.contains((3L, 0L, 3L, rrf(0, 3))))
    assert(out3.map(_._1).toSet == Set(1L, 2L, 3L))
  }

  test("leakFreeSplit: no near-dup pair straddles a split; assignment is total and rerun-stable") {
    val d = Sources.table(spark, sfDir, "documents")
    val pairs = NearDup.simHashPairsCapped(NearDup.simHash(d), 3, 64L)
      .select("doc_a", "doc_b")
    val clusters = Graph.connectedComponents(pairs, "doc_a", "doc_b")
    val split = DataMix.leakFreeSplit(d, clusters, "salt-test")
    val s = split.select(col("doc_id"), col("split"))
    val viol = pairs
      .join(s.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(s.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(viol == 0, "near-dup pair split across train/val/test")
    assert(split.count() == d.count(), "split must assign every doc exactly once")
    val again = DataMix.leakFreeSplit(d, clusters, "salt-test")
      .select("doc_id", "split").collect().toSet
    assert(again == s.collect().toSet, "split must be deterministic")
    // a different salt yields a different (but still leak-free) assignment
    val other = DataMix.leakFreeSplit(d, clusters, "salt-other")
      .select("doc_id", "split").collect().toSet
    assert(other != again, "salt must decorrelate split draws")
  }

  test("dsirImportance: closed-form add-1 smoothed log-ratios on a literal corpus") {
    val buckets = 64
    val salt = "dsir-spec"
    val d = Seq(
      (1L, "aa aa aa", "tgt"),
      (2L, "bb bb", "raw"),
      (3L, "aa bb", "raw")).toDF("doc_id", "text", "source")
    val out = DataMix.dsirImportance(d, col("source") === "tgt", buckets, salt)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // replicate the model independently: bucket-level counts...
    val toks = Map(1L -> Seq("aa", "aa", "aa"), 2L -> Seq("bb", "bb"),
      3L -> Seq("aa", "bb"))
    val tgtDocs = Set(1L)
    val all = toks.toSeq.flatMap { case (id, ts) => ts.map(id -> _) }
    val byBucket = all.groupBy { case (_, t) => bucketOf(t, buckets, salt) }
    val rawTot = all.size
    val tgtTot = all.count { case (id, _) => tgtDocs(id) }
    // ...per-bucket 6-dp-rounded score...
    val score = byBucket.map { case (b, xs) =>
      val raw = xs.size
      val tgt = xs.count { case (id, _) => tgtDocs(id) }
      b -> BigDecimal(
        math.log((tgt + 1).toDouble / (tgtTot + buckets)) -
          math.log((raw + 1).toDouble / (rawTot + buckets)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    // ...and the exact count-weighted per-doc sum
    val expected = toks.map { case (id, ts) =>
      id -> ts.groupBy(t => bucketOf(t, buckets, salt))
        .map { case (b, g) => score(b) * g.size }.sum.toDouble
    }
    for ((id, (n, w)) <- out) {
      assert(n == toks(id).size)
      assert(w == expected(id), s"doc $id")
    }
    // the pure-target-token doc must outscore the pure-raw-token doc
    assert(out(1L)._2 > out(2L)._2)
  }

  test("labelDispersion: identity matches brute-force pairwise dots; singletons excluded") {
    val emb = Seq(
      (1L, Array(1f, 0f, 0f), 1),   // label 1: identical pair -> avg dot 1
      (2L, Array(1f, 0f, 0f), 1),
      (3L, Array(1f, 0f, 0f), 2),   // label 2: orthogonal pair -> avg dot 0
      (4L, Array(0f, 1f, 0f), 2),
      (5L, Array(0f, 0f, 1f), 3))   // label 3: singleton -> excluded
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelDispersion(emb)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map(1 -> ((2L, 1.0)), 2 -> ((2L, 0.0))))
    // fixtures: the O(n·d) identity must agree with the O(n²) pair join
    val fx = Sources.table(spark, sfDir, "embeddings")
    val fast = Similarity.labelDispersion(fx)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val v = Similarity.asDouble(col("embedding"))
    val e = fx.select(col("label"), col("vec_id"), v.as("v"))
    val brute = e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .groupBy(col("a.label").as("label"))
      .agg(avg(Similarity.dot(col("a.v"), col("b.v"))).as("d"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for ((l, d) <- brute)
      assert(math.abs(fast(l) - d) < 1e-4,
        s"label $l: identity ${fast(l)} vs brute $d")
  }

  test("stream-scored DSIR equals the batch scorer row for row") {
    val streamed = graft.streaming.EventStream.runDsirScoreOnce(
      spark, sfDir, col("source") === "src3", 256, "dsir-v1")
      .collect().toSeq
    val batch = DataMix.dsirImportance(
      Sources.table(spark, sfDir, "documents"),
      col("source") === "src3", 256, "dsir-v1")
      .orderBy(col("doc_id").asc).collect().toSeq
    assert(streamed == batch,
      "scoring a doc through the stream must be bit-identical to batch")
  }

  test("tokenBudgetMix: cap binds on the small source and the freed budget redistributes") {
    def text(n: Int) = Seq.fill(n)("t").mkString(" ")
    val d = Seq(
      (1L, text(100), "a"), (2L, text(100), "b"), (3L, text(4), "c"))
      .toDF("doc_id", "text", "source")
    // budget = 204 DIV 1; base = 204 DIV 3 = 68; caps 200/200/8 =>
    // capped 68/68/8, leftover 60 over {a, b} => +30 each
    val out = DataMix.tokenBudgetMix(d, budgetDen = 1, capEpochs = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("a") == ((100L, 98L, 0.98)))
    assert(out("b") == ((100L, 98L, 0.98)))
    assert(out("c") == ((4L, 8L, 2.0)))
    assert(out.values.map(_._2).sum <= 204L, "allocation must respect the budget")
  }

  test("tokenBudgetMix: the repeat ceiling stays HARD through redistribution (small-headroom source)") {
    // the advisor's counterexample: skewed sources {120, 1000, 8×1},
    // capEpochs = 1, budgetDen = 1. base = 1128 DIV 10 = 112; the two
    // large sources are uncapped (headroom above base), the eight tiny
    // ones cap at 1; leftover (1128 − 232) DIV 2 = 448 per uncapped
    // source. UNclamped, the 120-token source would take 112 + 448 =
    // 560 tokens ≈ 4.67 epochs — 4.7× past the "hard" ceiling. The
    // clamp holds it at 120 (exactly 1 epoch).
    def text(n: Int) = Seq.fill(n)("t").mkString(" ")
    val d = (Seq((1L, text(120), "small"), (2L, text(1000), "big")) ++
      (3L to 10L).map(i => (i, text(1), s"tiny$i")))
      .toDF("doc_id", "text", "source")
    val out = DataMix.tokenBudgetMix(d, budgetDen = 1, capEpochs = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("small") == ((120L, 120L, 1.0)),
      "small-headroom source must clamp at capEpochs·tokens")
    assert(out("big") == ((1000L, 560L, 0.56)))
    for ((src, (n, alloc, epochs)) <- out) {
      assert(alloc <= n * 1, s"$src over the repeat ceiling")
      assert(epochs <= 1.0, s"$src epochs $epochs exceed capEpochs")
    }
    assert(out.values.map(_._2).sum <= 1128L)
  }

  test("trainManifest reconciles with BOTH parents (split census and budget allocation)") {
    val d = Sources.table(spark, sfDir, "documents")
    val pairs = NearDup.simHashPairsCapped(NearDup.simHash(d), 3, 64L)
      .select("doc_a", "doc_b")
    val clusters = Graph.connectedComponents(pairs, "doc_a", "doc_b")
    val manifest = DataMix.trainManifest(d, clusters, "salt-test",
      8000, 9000, budgetDen = 2, capEpochs = 2).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    // parent 1: the per-source census — manifest cells must partition it
    val census = d.select(col("source"),
        size(split(col("text"), " ")).cast("long").as("t"))
      .groupBy("source").agg(count(lit(1)).as("n"), sum(col("t")).as("tok"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bySrc = manifest.groupBy(_._2)
    assert(bySrc.keySet == census.keySet)
    for ((src, cells) <- bySrc) {
      assert(cells.map(_._3).sum == census(src)._1, s"$src doc count")
      assert(cells.map(_._4).sum == census(src)._2, s"$src token count")
    }
    // parent 2: the budget — per source, split allocations floor-sum to
    // the source allocation: never over, short by < |splits present|
    val alloc = DataMix.tokenBudgetMix(d, 2, 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    for ((src, cells) <- bySrc) {
      val got = cells.map(_._5).sum
      val want = alloc(src)
      assert(got <= want, s"$src split allocations exceed the source budget")
      assert(want - got < cells.length,
        s"$src floor remainder must stay under the cell count")
    }
    // splits are the leak-free ones: same hash, same salt
    val splits = DataMix.leakFreeSplit(d, clusters, "salt-test")
      .groupBy("split", "source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for ((sp, src, n, _, _) <- manifest)
      assert(splits((sp, src)) == n, s"($sp, $src) census mismatch")
  }

  test("dsirScoreUpsert: bounded-state production form lands the batch scorer's exact table; idempotent; retrain supersedes") {
    val dir = java.nio.file.Files.createTempDirectory("dsir_upsert").toString
    val target = s"$dir/scores"
    try {
      graft.streaming.EventStream.dsirScoreUpsert(
        spark, sfDir, col("source") === "src3", 256, "dsir-v1", target,
        modelVersion = 1L)
      def landed = spark.read.parquet(target)
        .select(col("doc_id"), col("n_tokens"), col("dsir_logratio"))
        .orderBy(col("doc_id").asc).collect().toSeq
      def batch(tgt: String, salt: String) = DataMix.dsirImportance(
        Sources.table(spark, sfDir, "documents"),
        col("source") === tgt, 256, salt)
        .orderBy(col("doc_id").asc).collect().toSeq
      val first = landed
      assert(first == batch("src3", "dsir-v1"),
        "foreachBatch-scored table must be row-identical to the batch scorer")
      // re-processing the whole stream at the SAME model version
      // (failure-recovery path) must converge to the same table:
      // scores are a pure function of the doc + broadcast model, and
      // the merge is latest-wins idempotent
      graft.streaming.EventStream.dsirScoreUpsert(
        spark, sfDir, col("source") === "src3", 256, "dsir-v1", target,
        modelVersion = 1L)
      assert(landed == first, "same-version re-ingest must be a no-op")
      // RETRAINING (different target) at a HIGHER version must
      // supersede every stale score — the reason the version column is
      // caller-supplied rather than derived from the (unchanged) data
      graft.streaming.EventStream.dsirScoreUpsert(
        spark, sfDir, col("source") === "src1", 256, "dsir-v1", target,
        modelVersion = 2L)
      assert(landed == batch("src1", "dsir-v1"),
        "higher-version rescore must replace the old model's table")
      // a LOWER-version re-score must be REFUSED before any stream
      // starts: latestByKey breaks equal-or-lower versions by arbitrary
      // row order, so merging it would leave a nondeterministic per-doc
      // mix of old and new scores
      val ex = intercept[IllegalArgumentException] {
        graft.streaming.EventStream.dsirScoreUpsert(
          spark, sfDir, col("source") === "src3", 256, "dsir-v1", target,
          modelVersion = 1L)
      }
      assert(ex.getMessage.contains("monotone"), ex.getMessage)
      assert(landed == batch("src1", "dsir-v1"),
        "the refused run must not have touched the table")
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }
}
