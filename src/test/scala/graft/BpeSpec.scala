package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE trainer: greedy left-to-right non-overlapping merge semantics,
  * pinned argmax order, multi-round interaction (round 2 counts see
  * round 1's merged sequences). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def toks(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  test("mergePass is greedy left-to-right over overlapping runs") {
    val docs = Seq(
      (1L, Seq("a", "a", "a")),            // odd run: merge (1,2) only
      (2L, Seq("a", "a", "a", "a")),       // even run: (1,2) and (3,4)
      (3L, Seq("b", "a", "a", "b")),       // interior pair
      (4L, Seq("a")),                      // single token untouched
      (5L, Seq("x", "y"))                  // non-matching pair untouched
    ).toDF("doc_id", "toks")
    val got = toks(Bpe.mergePass(docs, "a", "a"))
    assert(got(1L) === Seq("aa", "a"))
    assert(got(2L) === Seq("aa", "aa"))
    assert(got(3L) === Seq("b", "aa", "b"))
    assert(got(4L) === Seq("a"))
    assert(got(5L) === Seq("x", "y"))
  }

  test("mergePass: two separate chains in one document both merge") {
    val docs = Seq((1L, Seq("a", "a", "x", "a", "a", "a"))).toDF("doc_id", "toks")
    // chain 1 at pos 0-1; chain 2 (run of 3) merges its first pair only
    assert(toks(Bpe.mergePass(docs, "a", "a"))(1L) ===
      Seq("aa", "x", "aa", "a"))
  }

  test("trainMerges: round 2 counts the round-1-merged sequences") {
    // corpus: "c d c d" x3 and "c d" x1. Round 1: (c,d) n=7.
    // After merging, docs are [cd cd] x3, [cd] — round 2: (cd,cd) n=3.
    val docs = (1L to 3L).map(i => (i, "c d c d")).toDF("doc_id", "text")
      .union(Seq((4L, "c d")).toDF("doc_id", "text"))
    val m = Bpe.trainMerges(docs, col("text"), rounds = 2)
      .orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m === Array(
      (1L, "c", "d", "cd", 7L),
      (2L, "cd", "cd", "cdcd", 3L)))
  }

  test("encode conserves tokens: after = before − merged occurrences") {
    val docs = Seq((1L, "a a a a b"), (2L, "b a a")).toDF("doc_id", "text")
    val enc = toks(Bpe.encode(docs, col("text"), rounds = 1))
    // round 1 argmax is (a,a) n=4 (overlap-counted); greedy merges 3
    assert(enc(1L) === Seq("aa", "aa", "b"))
    assert(enc(2L) === Seq("b", "aa"))
  }

  test("trainMergesSampled at 10000 bps equals full-corpus training") {
    // pins the sampling plumbing: a full-rate sample must reproduce
    // trainMerges exactly (same argmax order, same counts)
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "c c a b"))
      .toDF("doc_id", "text")
    val full = Bpe.trainMerges(docs, col("text"), rounds = 2).collect().toSeq
    val sampled = Bpe.trainMergesSampled(docs, col("text"), rounds = 2,
      col("doc_id"), sampleBps = 10000, salt = "s").collect().toSeq
    assert(sampled === full)
  }

  test("trainMergesSampled trains on exactly the md5-bucket subset") {
    // a 50%-ish sample must equal training run directly on the subset
    // the shared hash predicate selects — membership is a pure function
    // of (doc_id, salt), never of partitioning
    val docs = (1L to 20L).map(i => (i, if (i % 3 == 0) "x y x y" else "p q"))
      .toDF("doc_id", "text")
    val bps = 5000
    val pred = graft.operators.Sampling.hashBucket(col("doc_id"), "s2") < bps
    val direct = Bpe.trainMerges(docs.filter(pred), col("text"), rounds = 1)
      .collect().toSeq
    val sampled = Bpe.trainMergesSampled(docs, col("text"), rounds = 1,
      col("doc_id"), bps, "s2").collect().toSeq
    assert(sampled === direct)
    val kept = docs.filter(pred).count()
    assert(kept > 0 && kept < 20, s"degenerate sample ($kept of 20)")
  }

  test("Staging.clear() invalidates the training memo: rebuild, not crash") {
    // Round-7 regression: the memoized final-sequence frame scans a
    // Staging temp-dir parquet; clear() deleted the dir but left the
    // memo, so the next call crashed on deleted files. The input must
    // be FILE-backed (literal rows bypass both the memo and staging).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val before = Bpe.encode(docs, col("text"), rounds = 2).count()
    graft.engine.Staging.clear()
    // must retrain over fresh staged dirs — the old frame's files are gone
    val after = Bpe.encode(docs, col("text"), rounds = 2).count()
    assert(after === before)
    assert(Bpe.trainMerges(docs, col("text"), rounds = 2).count() === 2L)
  }
}
