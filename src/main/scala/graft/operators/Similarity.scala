package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the full corpus; per-partition scoring, global rank per query.
  * Scale path: [[lshBucketedKnn]] pre-buckets vectors by random-hyperplane
  * signs so each query only scores its bucket (candidate set shrinks by
  * ~2^bits), the standard sub-linear ANN shape when the corpus no longer
  * fits a cross join.
  *
  * Dot products use the custom codegen'd [[graft.functions.DotProduct]]
  * expression (sequential left-to-right summation → deterministic,
  * engine-portable float order; the HOF alternative evaluates
  * interpreted). Elements are cast float→double (exact) before any
  * arithmetic.
  */
object Similarity {

  /** embedding column cast to Array[Double] (exact widening). */
  def asDouble(vec: Column): Column = vec.cast(ArrayType(DoubleType))

  /** Dot product via the custom codegen'd Catalyst expression
    * ([[graft.functions.DotProduct]]): the HOF form
    * (aggregate ∘ zip_with) evaluates interpreted and breaks whole-stage
    * codegen on the KNN hot path. Same left-to-right summation order. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dot(a, b)

  def l2norm(vec: Column): Column = sqrt(dot(vec, vec))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Per-vector L2 norms and dimensionality. */
  def norms(emb: DataFrame): DataFrame = {
    val v = asDouble(col("embedding"))
    emb.select(col("vec_id"), size(col("embedding")).cast("long").as("dim"),
      l2norm(v).as("l2_norm"))
  }

  /** cosine from a precomputed-norm layout: dot(a,b)/(na*nb). Each side
    * carries its L2 norm as a column so pairwise scoring does ONE dot
    * product instead of three (norms recomputed per pair would triple the
    * flops on the O(pairs) hot path). Bit-identical to [[cosine]]: the
    * norm is the same expression over the same values either way. */
  private def cosinePre(dotAB: Column, na: Column, nb: Column): Column =
    dotAB / (na * nb)

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded). Ranks are computed on cosine rounded
    * to 6 decimals with vec_id tie-break, so results are reproducible. */
  def bruteForceKnn(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_vec"),
      asDouble(col("embedding")).as("q_emb"))
      .withColumn("q_norm", l2norm(col("q_emb")))
    val c = emb.select(col("vec_id").as("n_vec"),
      asDouble(col("embedding")).as("n_emb"))
      .withColumn("n_norm", l2norm(col("n_emb")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_vec") =!= col("n_vec"))
      .withColumn("cosine", round(cosinePre(dot(col("q_emb"), col("n_emb")),
        col("q_norm"), col("n_norm")), 6))
    val w = Window.partitionBy(col("q_vec"))
      .orderBy(col("cosine").desc, col("n_vec").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_vec"), col("n_vec"), col("cosine"), col("rank"))
  }

  /** Per-label element-wise centroids — the coarse-quantizer building
    * block of an IVF index (and per-class mean embeddings generally).
    * posexplode → (label, dim) grouped avg: one shuffle carrying
    * |labels| × dims rows after partial aggregation. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(asDouble(col("embedding"))))
      .select(col("label"), (col("pos") + 1).cast("long").as("dim"), col("col").as("v"))
      .groupBy(col("label"), col("dim"))
      .agg(avg(col("v")).as("centroid"))

  /** Symmetric int8 scalar quantization audit — the ANN-index
    * compression step (4× smaller vectors) with its reconstruction
    * error measured per vector: scale = max|x|/127,
    * q(x) = floor(x/scale + ½) (portable half-up; |q| ≤ 127 by
    * construction since |x|/scale ≤ 127), err = max|x − q·scale|.
    * For a production index the q values would land in a BYTE array
    * column; this operator reports the quantization QUALITY stats a
    * pipeline gates on (worst-dim absolute error vs the ~scale/2
    * theoretical bound). Zero vectors quantize to zeros with zero
    * error. One posexplode + one agg, every op a deterministic IEEE
    * primitive — the audit is engine-exact. */
  def quantizeInt8Audit(emb: DataFrame): DataFrame = {
    val perDim = emb
      .select(col("vec_id"), posexplode(asDouble(col("embedding"))))
      .select(col("vec_id"), col("col").as("x"))
    val scaled = perDim
      .withColumn("maxabs", max(abs(col("x"))).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))))
      .withColumn("scale", col("maxabs") / 127)
      .withColumn("q",
        when(col("maxabs") === 0d, lit(0L))
          .otherwise(floor(col("x") / col("scale") + lit(0.5))))
      .withColumn("err",
        when(col("maxabs") === 0d, lit(0.0))
          .otherwise(abs(col("x") - col("q") * col("scale"))))
    scaled.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dims"),
        max(col("scale")).as("scale"),
        max(abs(col("q"))).as("max_q"),
        max(col("err")).as("max_abs_err"))
  }

  /** Random-hyperplane LSH signature: plane p votes the sign of the
    * projection Σ v(i) · w_p(i) with deterministic pseudo-random weights
    * w_p(i) = (i · m_p) mod 7 − 3 ∈ [−3, 3]; the multiplier
    * m_p = (p mod 6) + 1 is never ≡ 0 (mod 7), so no plane degenerates
    * to a constant-weight projection. Weights are pure functions of the
    * element INDEX, so with `dim` known they are literal arrays and the
    * projection runs on the codegen'd DotProduct (see [[lshBucketedKnn]]
    * for why the HOF form was retired from this hot path). One shared
    * definition serves the kNN index and the near-dup candidate
    * generator — and is mirrored literally by their SQL oracles. */
  private def lshSignature(vec: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { p =>
      val m = (p % 6) + 1
      val weights = array((0 until dim).map(i =>
        lit((((i * m) % 7) - 3).toDouble)): _*)
      when(dot(vec, weights) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** splitmix64 finalizer — the seed of the multi-table LSH weight
    * family. Deterministic and engine-independent: the oracle never
    * re-derives it, it interpolates the LITERAL weight arrays this
    * produces. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hyperplane weight for (table, plane, dim index): splitmix64 of the
    * packed coordinate, folded into [−3, 3]. Shared by the engine's
    * literal arrays AND by [[lshTableWeights]] (which the oracle
    * builder interpolates) — one definition, two surfaces. */
  private def lshWeight(t: Int, p: Int, i: Int): Int =
    (java.lang.Math.floorMod(mix64(((t.toLong * 64 + p) * 1024 + i)), 7) - 3).toInt

  /** The literal weight vectors of multi-table LSH, for oracle-side
    * interpolation: lshTableWeights(tables, planes, dim)(t)(p) is the
    * dim-length weight array of table t, plane p. */
  def lshTableWeights(tables: Int, planes: Int, dim: Int): Seq[Seq[Seq[Int]]] =
    (0 until tables).map(t => (0 until planes).map(p =>
      (0 until dim).map(i => lshWeight(t, p, i))))

  /** Multi-table LSH embedding near-dup pairs behind a per-bucket
    * population cap — the SCALE path for [[nearDupPairs]], whose exact
    * all-pairs form SCALE.md measures as non-executable at century
    * scale (a 2×10¹⁰-pair cross join at 200k vectors).
    *
    * `tables` independent signature tables of `planes` hyperplanes each
    * (splitmix-seeded literal weights — distinct per table, reproducible
    * by the oracle verbatim); candidates are pairs agreeing on ANY
    * table's full signature — the OR-of-ANDs banding that gives
    * hyperplane LSH usable recall (a single signature's p^planes match
    * probability collapses for mid-similarity pairs; L tables lift it
    * to 1 − (1 − p^planes)^L — the same reason the minhash pipeline
    * bands its signature rows). Work is Σ m² over (table, bucket)
    * populations, never n²; buckets OVER `maxBucket` are star-reduced
    * to their min-vec_id anchor exactly like the simhash/minhash capped
    * generators — m−1 edges instead of m(m−1)/2, output linear in the
    * corpus for a fixed cap, components preserved through the anchor.
    * Every emitted edge — star or not — carries the exact rounded
    * cosine and must clear `minCosine`, so precision is 1 relative to
    * [[nearDupPairs]]; recall is the planes/tables knob and the
    * subset property is pinned by spec. */
  def nearDupPairsLsh(emb: DataFrame, minCosine: Double, planes: Int,
                      tables: Int, maxBucket: Long): DataFrame = {
    require(maxBucket >= 2, "maxBucket must be at least 2")
    require(planes >= 1 && planes <= 62, "planes must fit a long signature")
    require(tables >= 1, "at least one signature table")
    // same one-pass dimensionality probe + ragged-corpus guard as
    // lshBucketedKnn (model-sized, plan-construction time)
    val dims = emb.agg(min(size(col("embedding"))), max(size(col("embedding")))).head()
    if (dims.isNullAt(0))
      return emb.select(col("vec_id").as("vec_a"), col("vec_id").as("vec_b"),
        lit(0.0).as("cosine")).limit(0)
    require(dims.getInt(0) == dims.getInt(1),
      s"nearDupPairsLsh needs uniform embedding dimensionality; corpus has " +
        s"lengths ${dims.getInt(0)}..${dims.getInt(1)}")
    val dim = dims.getInt(0)
    def sig(vec: Column, t: Int): Column = (0 until planes).map { p =>
      val weights = array((0 until dim).map(i =>
        lit(lshWeight(t, p, i).toDouble)): _*)
      when(dot(vec, weights) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    // SLIM (vec_id, tbl, bucket) band table — `tables` rows per vector,
    // ids only. The first cut of this operator carried the full vector
    // (and its norm) through the band table and the m² bucket join —
    // 16× redundant vector bytes through every shuffle, which at sf10
    // (2M × 64-dim vectors) filled the disk before the pair join even
    // finished. Candidates are generated over ids, DISTINCT'd across
    // tables (a pair sharing k tables collapses to one row BEFORE any
    // vector is shipped), and only then verified by joining the vectors
    // back by id — each vector crosses the wire once per distinct
    // candidate, not once per band row. Referenced by the stats agg and
    // both join sides → land it once (staged parquet, same pattern as
    // the simhash band tables).
    val b = Shingles.shared(
      emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .select(col("vec_id"),
          explode(array((0 until tables).map(t =>
            struct(lit(t).as("tbl"), sig(col("v"), t).as("bucket"))): _*)).as("x"))
        .select(col("vec_id"), col("x.tbl").as("tbl"), col("x.bucket").as("bucket")))
    val stats = b.groupBy(col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("__n"), min(col("vec_id")).as("__a"))
    val tagged = b.join(stats, Seq("tbl", "bucket"))
    val small = tagged.filter(col("__n") <= maxBucket)
    val allPairs = small
      .select(col("tbl"), col("bucket"), col("vec_id").as("vec_a"))
      .join(small.select(col("tbl"), col("bucket"), col("vec_id").as("vec_b")),
        Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
    val star = tagged.filter(col("__n") > maxBucket)
      .filter(col("vec_id") =!= col("__a"))
      // the anchor carries the bucket's min vec_id, so vec_a < vec_b
      .select(col("__a").as("vec_a"), col("vec_id").as("vec_b"))
    val cand = allPairs.union(star).distinct()
    // verify: fetch each side's vector by id and keep pairs clearing
    // the exact rounded-cosine threshold — same pair set as verifying
    // inside the band join (cosine is a pure function of the pair),
    // at a fraction of the shuffled bytes
    val vecs = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    cand
      .join(vecs.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("nrm").as("na")), Seq("vec_a"))
      .join(vecs.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("nrm").as("nb")), Seq("vec_b"))
      .withColumn("cosine",
        round(cosinePre(dot(col("va"), col("vb")), col("na"), col("nb")), 6))
      .filter(col("cosine") >= minCosine)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** INCREMENTAL [[nearDupPairsLsh]]: the pairs a full run over
    * (corpus ∪ batch) would ADD — batch-vs-corpus plus batch-internal,
    * i.e. exactly its pairs touching at least one batch vector —
    * without re-pairing the corpus (the embedding twin of
    * [[graft.operators.NearDup.incrementalSimhashPairsCapped]]). The
    * corpus's band table and per-bucket census are plan-keyed staged,
    * so every batch after the first probes landed tables only; cap
    * semantics are UNION-EXACT (bucket populations counted over
    * corpus + batch; an over-cap union bucket stars its batch members
    * to the union anchor, which is the corpus anchor whenever corpus
    * members exist). Every candidate is verified by the exact rounded
    * cosine, same as the full generator.
    *
    * CONTRACT: every batch vec_id must exceed every corpus vec_id
    * (monotone ingest ids) and both sides must share one embedding
    * dimensionality. */
  def incrementalNearDupPairsLsh(corpusEmb: DataFrame, batchEmb: DataFrame,
                                 minCosine: Double, planes: Int,
                                 tables: Int, maxBucket: Long): DataFrame = {
    require(maxBucket >= 2, "maxBucket must be at least 2")
    require(planes >= 1 && planes <= 62, "planes must fit a long signature")
    require(tables >= 1, "at least one signature table")
    val bd = batchEmb.agg(min(size(col("embedding"))),
      max(size(col("embedding")))).head()
    if (bd.isNullAt(0))
      return batchEmb.select(col("vec_id").as("vec_a"),
        col("vec_id").as("vec_b"), lit(0.0).as("cosine")).limit(0)
    val cd = corpusEmb.agg(min(size(col("embedding"))),
      max(size(col("embedding")))).head()
    require(!cd.isNullAt(0), "incremental LSH needs a non-empty corpus")
    require(cd.getInt(0) == cd.getInt(1) && bd.getInt(0) == bd.getInt(1) &&
      cd.getInt(0) == bd.getInt(0),
      s"incremental LSH needs ONE embedding dimensionality; corpus has " +
        s"${cd.getInt(0)}..${cd.getInt(1)}, batch ${bd.getInt(0)}..${bd.getInt(1)}")
    val dim = cd.getInt(0)
    def sig(vec: Column, t: Int): Column = (0 until planes).map { p =>
      val weights = array((0 until dim).map(i =>
        lit(lshWeight(t, p, i).toDouble)): _*)
      when(dot(vec, weights) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    def bandsOf(emb: DataFrame): DataFrame = emb
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .select(col("vec_id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"), sig(col("v"), t).as("bucket"))): _*)).as("x"))
      .select(col("vec_id"), col("x.tbl").as("tbl"), col("x.bucket").as("bucket"))
    // corpus band table + census: landed once per corpus
    val cb = Shingles.shared(bandsOf(corpusEmb))
    val cs = Shingles.shared(cb.groupBy(col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("__nc"), min(col("vec_id")).as("__ac")))
    val bb = bandsOf(batchEmb)
    val bs = bb.groupBy(col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("__nb"), min(col("vec_id")).as("__ab"))
    val stats = bs.join(cs, Seq("tbl", "bucket"), "left")
      .select(col("tbl"), col("bucket"),
        (col("__nb") + coalesce(col("__nc"), lit(0L))).as("__n"),
        coalesce(col("__ac"), col("__ab")).as("__a"))
    val taggedB = bb.join(stats, Seq("tbl", "bucket"))
    val smallB = taggedB.filter(col("__n") <= maxBucket)
    val vsCorpus = smallB.select(col("tbl"), col("bucket"),
        col("vec_id").as("vec_new"))
      .join(cb.select(col("tbl"), col("bucket"), col("vec_id").as("vec_c")),
        Seq("tbl", "bucket"))
      .select(least(col("vec_new"), col("vec_c")).as("vec_a"),
        greatest(col("vec_new"), col("vec_c")).as("vec_b"))
    val withinB = smallB.select(col("tbl"), col("bucket"),
        col("vec_id").as("vec_a"))
      .join(smallB.select(col("tbl"), col("bucket"), col("vec_id").as("vec_b")),
        Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
    val star = taggedB.filter(col("__n") > maxBucket)
      .filter(col("vec_id") =!= col("__a"))
      .select(least(col("__a"), col("vec_id")).as("vec_a"),
        greatest(col("__a"), col("vec_id")).as("vec_b"))
    val cand = vsCorpus.union(withinB).union(star).distinct()
    // verify against the union vector table — each endpoint resolves
    // from whichever side owns it, and every pair clears the exact
    // rounded cosine exactly like the full generator
    val vecs = corpusEmb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .unionByName(batchEmb.select(col("vec_id"),
        asDouble(col("embedding")).as("v")))
      .withColumn("nrm", l2norm(col("v")))
    cand
      .join(vecs.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("nrm").as("na")), Seq("vec_a"))
      .join(vecs.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("nrm").as("nb")), Seq("vec_b"))
      .withColumn("cosine",
        round(cosinePre(dot(col("va"), col("vb")), col("na"), col("nb")), 6))
      .filter(col("cosine") >= minCosine)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) with cosine ≥
    * threshold. Exact O(n²) form — at corpus scale, generate candidates
    * with [[nearDupPairsLsh]]/[[lshBucketedKnn]]/[[ivfKnn]] blocking
    * first and reserve this as the verify step over candidates. */
  def nearDupPairs(emb: DataFrame, minCosine: Double,
                   blockSize: Int = 256): DataFrame = {
    // Blocked all-pairs layout (the dense-scoring analog of block matrix
    // multiply): vectors group into ⌈n/blockSize⌉ blocks, the join runs
    // over BLOCK pairs (B²/2 small rows, broadcast right side), and each
    // block pair is scored by the native [[graft.functions.CosineBlockPairs]]
    // generator — a JIT'd primitive loop. A row-per-pair cartesian instead
    // evaluates the scoring expression per pair on the interpreted
    // BroadcastNestedLoopJoin condition path (measured ~5× slower), and a
    // single small parquet source gives it 1 task of parallelism on top.
    val blocks = emb.select(expr(s"vec_id div $blockSize").as("blk"),
        struct(col("vec_id").cast("long").as("vec_id"),
          asDouble(col("embedding")).as("v")).as("s"))
      .groupBy(col("blk")).agg(collect_list(col("s")).as("vs"))
    val a = blocks.select(col("blk").as("blk_a"), col("vs").as("vs_a"))
    val b = blocks.select(col("blk").as("blk_b"), col("vs").as("vs_b"))
    val gen = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.CosineBlockPairs(
        org.apache.spark.sql.GraftSqlBridge.expression(col("vs_a")),
        org.apache.spark.sql.GraftSqlBridge.expression(col("vs_b")),
        minCosine))
    // blk_a ≤ blk_b covers every unordered block pair once; the generator
    // enforces vec_a < vec_b inside, so same-block pairs are not doubled.
    // The explicit partition count matters: block-pair rows are small in
    // BYTES but heavy in COMPUTE, so AQE's byte-based coalescing would
    // funnel them into one task; repartition(n, …) pins the fan-out.
    val parts = emb.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    a.join(broadcast(b), col("blk_a") <= col("blk_b"))
      .repartition(parts, col("blk_a"), col("blk_b"))
      .select(gen)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** IVF-style ANN: the corpus is partitioned into inverted lists by
    * nearest coarse centroid; each query scores only the lists of its
    * `nProbe` nearest centroids. With |centroids| = √n lists this turns
    * the n·q cross join into ~q·nProbe·√n scored pairs — the standard
    * sub-linear ANN layout. Centroids come in (centroid_id, dim, value)
    * row form — either [[labelCentroids]] naming (label, dim, centroid)
    * or [[KMeansQuantizer.fit]] naming (centroid_id, dim, c); both are
    * accepted. Assignments and ranks break ties on rounded cosine + id,
    * so the result is deterministic. */
  def ivfKnn(emb: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: Int, nProbe: Int): DataFrame = {
    // (centroid_id, dim, value) rows → (centroid_id, cvec Array[Double])
    val cc = centroids.columns.toSet
    require(cc.contains("dim") && (cc.contains("label") || cc.contains("centroid_id"))
        && (cc.contains("centroid") || cc.contains("c")),
      s"ivfKnn centroids must have columns (label|centroid_id, dim, centroid|c); " +
        s"got (${centroids.columns.mkString(", ")})")
    val cId = if (cc.contains("centroid_id")) col("centroid_id") else col("label")
    val cVal = if (cc.contains("centroid")) col("centroid") else col("c")
    val centVecs = centroids
      .groupBy(cId.as("centroid_id"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), cVal.as("centroid")))),
        x => x.getField("centroid")).as("cvec"))
      .withColumn("c_norm", l2norm(col("cvec")))
    def scoreCentroids(vecs: DataFrame, vecCol: String, normCol: String): DataFrame =
      vecs.crossJoin(broadcast(centVecs))
        .withColumn("c_cos", round(cosinePre(dot(col(vecCol), col("cvec")),
          col(normCol), col("c_norm")), 6))
        .drop("cvec", "c_norm")
    // Corpus assignment (keep=1) is an argmin HASH aggregation, not a
    // sort window: min(struct(-cos, id)) keeps partial aggregation
    // map-side and never sorts the corpus — the 100 TB-side of the
    // operator. (-cos over ROUNDED cosines is exact, ties → smaller id.)
    // NaN cosines (zero-norm centroid) must sort FIRST like the window
    // form's `c_cos DESC` (SQL orders NaN greatest): -NaN is still NaN,
    // which min() would rank last, so map NaN to -Infinity explicitly.
    val corpus = {
      val scored = scoreCentroids(
        emb.select(col("vec_id").as("n_vec"), asDouble(col("embedding")).as("n_emb"))
          .withColumn("n_norm", l2norm(col("n_emb"))),
        "n_emb", "n_norm")
      val negCos = when(isnan(col("c_cos")), lit(Double.NegativeInfinity))
        .otherwise(-col("c_cos"))
      scored.groupBy(col("n_vec"))
        .agg(min(struct(negCos.as("nc"), col("centroid_id"))).as("m"),
          first(col("n_emb")).as("n_emb"), first(col("n_norm")).as("n_norm"))
        .select(col("m.centroid_id").as("centroid_id"), col("n_vec"),
          col("n_emb"), col("n_norm"))
    }
    // Query probes (keep=nProbe) rank over |centroids| rows per query —
    // the query set is small by contract, so a per-query window is fine.
    val probes = {
      val scored = scoreCentroids(
        queries.select(col("vec_id").as("q_vec"), asDouble(col("embedding")).as("q_emb"))
          .withColumn("q_norm", l2norm(col("q_emb"))),
        "q_emb", "q_norm")
      val w = Window.partitionBy(col("q_vec"))
        .orderBy(col("c_cos").desc, col("centroid_id").asc)
      scored.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= nProbe)
        .drop("__r", "c_cos")
    }
    val scored = corpus.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("q_vec") =!= col("n_vec"))
      .withColumn("cosine", round(cosinePre(dot(col("q_emb"), col("n_emb")),
        col("q_norm"), col("n_norm")), 6))
    val w = Window.partitionBy(col("q_vec"))
      .orderBy(col("cosine").desc, col("n_vec").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_vec"), col("n_vec"), col("cosine"), col("rank"))
  }

  /** LSH-bucketed ANN: sign-bit signature over `planes` pseudo-random
    * hyperplanes (deterministic from the vector itself via index-seeded
    * element signs), queries scored only against same-bucket vectors.
    * Approximate by construction; at 100 TB the bucket join replaces the
    * cross join and candidate counts drop by ~2^planes. */
  def lshBucketedKnn(emb: DataFrame, queries: DataFrame, k: Int, planes: Int): DataFrame = {
    // weights are a pure function of the element INDEX, so with the
    // (uniform) dimensionality known they become literal arrays and the
    // projection runs on the codegen'd DotProduct — the earlier
    // aggregate∘zip_with form was interpreted (HOFs are CodegenFallback)
    // over every corpus vector, exactly the hot-path pattern this file's
    // header rules out. Same left-to-right double accumulation, so
    // signatures are bit-identical to the HOF form and the SQL oracle.
    // one model-sized probe job at plan-construction time (documented —
    // same class as the kmeans centroid collect): min/max dimensionality
    // in ONE pass, so ragged corpora fail loudly instead of silently
    // truncating to an arbitrary first row's length (DotProduct uses the
    // min of the two lengths), and the probed dim is a property of the
    // whole corpus, not of partition order
    val dims = emb.agg(min(size(col("embedding"))), max(size(col("embedding")))).head()
    if (dims.isNullAt(0))
      return queries.select(col("vec_id").as("q_vec"), col("vec_id").as("n_vec"),
        lit(0.0).as("cosine"), lit(0L).as("rank")).limit(0)
    require(dims.getInt(0) == dims.getInt(1),
      s"lshBucketedKnn needs uniform embedding dimensionality; corpus has " +
        s"lengths ${dims.getInt(0)}..${dims.getInt(1)}")
    val dim = dims.getInt(0)
    def bucket(vec: Column): Column = lshSignature(vec, planes, dim)
    val c = emb.select(col("vec_id").as("n_vec"),
      asDouble(col("embedding")).as("n_emb"))
      .withColumn("bucket", bucket(col("n_emb")))
      .withColumn("n_norm", l2norm(col("n_emb")))
    val q = queries.select(col("vec_id").as("q_vec"),
      asDouble(col("embedding")).as("q_emb"))
      .withColumn("bucket", bucket(col("q_emb")))
      .withColumn("q_norm", l2norm(col("q_emb")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_vec") =!= col("n_vec"))
      .withColumn("cosine", round(cosinePre(dot(col("q_emb"), col("n_emb")),
        col("q_norm"), col("n_norm")), 6))
    val w = Window.partitionBy(col("q_vec"))
      .orderBy(col("cosine").desc, col("n_vec").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_vec"), col("n_vec"), col("cosine"), col("rank"))
  }

  /** Per-label embedding dispersion — the average pairwise dot product
    * inside each label (≈ cosine for unit-norm corpora), WITHOUT the
    * O(n²) pair join, via the sum-vector identity
    *
    *   avg_{i≠j} vᵢ·vⱼ = (‖Σᵢvᵢ‖² − Σᵢ‖vᵢ‖²) / (n(n−1))
    *
    * — the embedding-space health audit (are labels collapsed? how
    * semantically diverse is a slice?) at O(n·d) cost: one posexplode
    * scan, a (label, dim) hash agg, and |labels|-row arithmetic. At
    * 100 TB this is the only executable formulation; the pair join the
    * identity replaces is the same n² wall q45's oracle hits.
    *
    * Exactness: components cast float→double (exact) → DECIMAL(28,12)
    * (the proven double→decimal cast contract); per-dim sums are exact
    * decimal, re-rounded through double at DECIMAL(18,6) so their
    * squares ((18,6)² = (37,12)) and both Σ stay exact; the single
    * closing double division is the only inexact op, under round(6).
    * Labels with one vector have no pairs and are excluded. */
  def labelDispersion(emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = emb.select(col("label"), asDouble(col("embedding")).as("v"))
    val perDim = e.select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), (col("pos") + 1).cast("long").as("dim"))
      .agg(sum(col("col").cast(DecimalType(28, 12))).as("s_exact"))
      .select(col("label"),
        col("s_exact").cast("double").cast(DecimalType(18, 6)).as("s"))
    val a = perDim.groupBy(col("label")).agg(sum(col("s") * col("s")).as("a2"))
    val b = e.select(col("label"),
        dot(col("v"), col("v")).cast(DecimalType(18, 6)).as("n2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("n2")).as("b2"))
    a.join(b, Seq("label"))
      .filter(col("n_vecs") > 1)
      .select(col("label"), col("n_vecs"),
        round((col("a2") - col("b2")).cast("double") /
          (col("n_vecs") * (col("n_vecs") - lit(1L))), 6).as("intra_avg_dot"))
      .orderBy(col("label").asc)
  }
}
