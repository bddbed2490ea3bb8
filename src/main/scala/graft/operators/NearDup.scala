package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns._

/** Near-duplicate detection for a training-data pipeline, three ways:
  *
  *  - MinHash + LSH banding: shingle → k seeded min-hashes → band buckets →
  *    bucket-join. The join is on (band, bucket), so candidate generation is
  *    a hash-partitioned equi-join whose cost scales with bucket collisions,
  *    NOT with n² — the 100 TB-safe shape for fuzzy dedup.
  *  - SimHash: per-document 16-bit sign fingerprint of token hashes; near
  *    dups are pairs at small Hamming distance.
  *  - Exact n-gram Jaccard: shingle equi-join restricted to a blocking key
  *    (source), used to score/verify candidates exactly.
  *
  * All hashes are md5 hex strings (engine-portable); min over hex strings
  * is lexicographic, which every engine implements identically.
  */
object NearDup {

  /** Distinct (doc_id, shingle) pairs; blockCols are carried through. */
  private def shingleTable(docs: DataFrame, blockCols: Seq[String]): DataFrame =
    docs.select((col("doc_id") +: blockCols.map(col)) :+
        explode(array_distinct(shingles3(tokens(col("text"))))).as("shingle"): _*)
      .distinct()

  /** MinHash signatures: one row per doc, k min-hash columns s0..s(k-1).
    * Computed as k `min` aggregates in ONE hash aggregation (no seed
    * explosion): per-group state is k strings, shuffle is O(docs). */
  def minHashSignatures(docs: DataFrame, k: Int): DataFrame = {
    val sh = shingleTable(docs, Nil)
    sh.groupBy(col("doc_id"))
      .agg(min(seededHash(0, col("shingle"))).as("s0"),
        (1 until k).map(i => min(seededHash(i, col("shingle"))).as(s"s$i")): _*)
  }

  /** LSH band buckets: `bands` rows per doc, bucket = md5 of the band's
    * signature slice. */
  def lshBuckets(signatures: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => col(s"s${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", slice: _*)).as("bucket"))
    }
    signatures.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Candidate near-dup pairs: docs sharing any LSH bucket (doc_a < doc_b). */
  def minHashCandidates(docs: DataFrame, k: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    require(bands * rowsPerBand <= k)
    val bk = lshBuckets(minHashSignatures(docs, k), bands, rowsPerBand)
    val a = bk.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = bk.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** 16-bit SimHash fingerprint per document. Tokens keep multiplicity
    * (multiplicity = weight). Bit b of the fingerprint is set iff the sum
    * over tokens of ±1 (by bit b of the token's md5 prefix) is positive. */
  def simHash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("h"))
    val withNibbles = tok.select(col("doc_id") +:
      (1 to 4).map(j => hexNibble(col("h"), j).as(s"nib$j")): _*)
    val sums = withNibbles.groupBy(col("doc_id")).agg(
      sumBit(0).as("b0"), (1 until 16).map(b => sumBit(b).as(s"b$b")): _*)
    val fp = (0 until 16).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    sums.select(col("doc_id"), fp.as("simhash"))
  }

  /** ±1 vote for bit b: nibble j = b/4 (hex digit 1-based), bit k = b%4. */
  private def sumBit(b: Int): Column = {
    val nib = col(s"nib${b / 4 + 1}")
    val bit = shiftright(nib, b % 4).bitwiseAND(lit(1))
    sum(when(bit === 1, 1).otherwise(-1))
  }

  /** Pairs of documents within `maxHamming` SimHash bits of each other.
    * O(n²) compare — at scale, pre-block on fingerprint prefix bands
    * before this comparison (same LSH idea as MinHash). */
  def simHashPairs(fingerprints: DataFrame, maxHamming: Int): DataFrame = {
    val a = fingerprints.select(col("doc_id").as("doc_a"), col("simhash").as("fp_a"))
    val b = fingerprints.select(col("doc_id").as("doc_b"), col("simhash").as("fp_b"))
    a.crossJoin(b)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Exact 3-gram Jaccard similarity for pairs sharing a blocking key and
    * at least one shingle. Shingle equi-join (shuffle on shingle hash),
    * never a cross join. */
  def ngramJaccardPairs(docs: DataFrame, blockCol: String, minJaccard: Double): DataFrame = {
    val sh = shingleTable(docs, Seq(blockCol))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val a = sh.select(col(blockCol), col("shingle"), col("doc_id").as("doc_a"))
    val b = sh.select(col(blockCol), col("shingle"), col("doc_id").as("doc_b"))
    val inter = a.join(b, Seq(blockCol, "shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_shingles", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_shingles", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("n_common") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
  }
}
