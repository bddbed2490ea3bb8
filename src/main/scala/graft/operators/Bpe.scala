package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE-style tokenizer training: iteratively learn merge
  * rules over a space-tokenized corpus — the trainable complement of
  * the static pair-frequency statistic (q99). Each round counts every
  * adjacent token pair corpus-wide, picks the most frequent (ties
  * broken (count DESC, left ASC, right ASC) — a pinned total order),
  * and merges its non-overlapping occurrences left-to-right, classic
  * greedy BPE semantics: within a run of k overlapping matches
  * (`a a a a` for pair (a,a)) the 1st, 3rd, ... merge and the tokens
  * they consume drop out.
  *
  * Scale shape: each round is one explode → map-side-combined pair
  * count (the top-1 is a TakeOrdered of the |vocab²|-bounded pair
  * table), plus one window pass + re-aggregation both keyed by doc_id
  * (a single hash partitioning reused end-to-end). The per-round
  * sequence table is LANDED via [[graft.engine.Staging]] — round r+1
  * scans a flat parquet instead of re-running r rounds of windows, the
  * same lineage discipline as the iterative CC/k-means paths, and the
  * exact shape of a production tokenizer-training pipeline (each merge
  * round lands, the trainer loop reads the landed table). The only
  * driver-side data movement is ONE row per round (the argmax pair) —
  * the KMeansQuantizer model-sized-collect discipline.
  *
  * The greedy pass is pure codegen window arithmetic, no UDFs/HOF
  * lambdas: match flags via lead, overlap runs via the
  * (pos − running-match-count) chain id, the merge-every-other rule
  * via parity against the chain start, consumed tokens via lag.
  */
object Bpe {

  /** (doc_id, pos, tok, nxt) positional pair table of the current
    * sequences; `nxt` is NULL at each document's end. */
  private def positional(seq: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    seq.select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("nxt", lead(col("tok"), 1).over(w))
  }

  /** Corpus-wide adjacent-pair counts of the current sequences. */
  private[graft] def pairCounts(seq: DataFrame): DataFrame =
    positional(seq)
      .filter(col("nxt").isNotNull)
      .groupBy(col("tok").as("lhs"), col("nxt").as("rhs"))
      .agg(count(lit(1)).as("n"))

  /** One greedy merge pass: every left-to-right non-overlapping (l, r)
    * adjacency becomes the concatenated token. */
  private[graft] def mergePass(seq: DataFrame, l: String, r: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val wg = Window.partitionBy("doc_id", "grp")
    // chain id: consecutive match positions share (pos − running match
    // count); separate chains in one doc can never collide because the
    // running count stands still across the gap while pos advances
    val p = positional(seq).select(col("doc_id"), col("pos"), col("tok"), col("nxt"),
      (col("tok") === lit(l) && col("nxt") === lit(r)).cast("int").as("m"))
    val g = p.withColumn("grp", col("pos") - sum(col("m")).over(w))
    val k = g
      .withColumn("grp_start", min(when(col("m") === 1, col("pos"))).over(wg))
      .withColumn("ms", // merge starts at even offsets within the chain
        col("m") === 1 && (col("pos") - col("grp_start")) % 2 === 0)
    k.withColumn("consumed", coalesce(lag(col("ms"), 1).over(w), lit(false)))
      .filter(!col("consumed"))
      .select(col("doc_id"), col("pos"),
        when(col("ms"), concat(col("tok"), col("nxt"))).otherwise(col("tok")).as("out"))
      .groupBy(col("doc_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("out")))),
        x => x.getField("out")).as("toks"))
  }

  /** Process-wide memo of completed training runs, keyed by the input
    * plan + files + round count. [[trainMerges]] (q164) and [[encode]]
    * (q165) both need the same run, and each round's argmax is a
    * corpus-wide shuffle — one training pass per (corpus, rounds) per
    * process, not one per caller. The final sequences are staged
    * parquet (see the round loop), so the cached frame is a flat scan,
    * safe to hand to any later consumer. */
  private val trained = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[(Long, String, String, String, Long)], DataFrame)]()

  // the memoized `seq` frames scan Staging temp-dir parquet — when
  // Staging.clear() deletes those dirs this memo MUST die with them,
  // or the next q164/q165 call serves a frame over deleted files
  // (round-7 full-suite red: PlanInvariantsSpec cleared staging, the
  // later QueriesSpec run crashed on the stale memo). Registered once
  // at object init; a cleared memo just means one retrain.
  graft.engine.Staging.onClear(() => trained.clear())

  /** The merge-rule table after `rounds` rounds plus the final encoded
    * sequences: (merges(round, lhs, rhs, merged, n_pairs), seq).
    * Memoized per (input plan, files, rounds) — except for literal-row
    * inputs, whose canonicalized plan omits the data (two literal
    * corpora of the same shape would collide on one key; same guard as
    * Staging.stagedByPlan). */
  private def train(docs: DataFrame, textCol: Column,
                    rounds: Int): (Seq[(Long, String, String, String, Long)], DataFrame) = {
    val seq0 = docs.select(col("doc_id"), split(textCol, " ").as("toks"))
    val hasLiteralRows = seq0.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
        if l.data.nonEmpty => l
    }.nonEmpty
    if (hasLiteralRows) trainRounds(seq0, rounds)
    else {
      val planText = seq0.queryExecution.analyzed.canonicalized.toString
      val files = seq0.inputFiles.sorted.mkString("\n")
      val key = rounds + ":" + java.security.MessageDigest.getInstance("MD5")
        .digest((planText + "|" + files).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Option(trained.get(key)).getOrElse {
        val r = trainRounds(seq0, rounds)
        Option(trained.putIfAbsent(key, r)).getOrElse(r)
      }
    }
  }

  private def trainRounds(seq0: DataFrame,
                          rounds: Int): (Seq[(Long, String, String, String, Long)], DataFrame) = {
    var seq = seq0
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val top = pairCounts(seq)
        .orderBy(col("n").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, rr, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, l, rr, l + rr, n))
        seq = graft.engine.Staging.stagedByPlan(mergePass(seq, l, rr), s"bpe_r$r")
      }
    }
    (merges.result(), seq)
  }

  /** Learned merge rules, one row per round. */
  def trainMerges(docs: DataFrame, textCol: Column, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, rounds)._1
      .toDF("round", "lhs", "rhs", "merged", "n_pairs")
  }

  /** [[trainMerges]] over a DETERMINISTIC md5-bucket sample of the
    * corpus (`sampleBps` basis points by `idCol`, the q54 mixing hash)
    * — the 100 TB answer to training's super-linear cost: each merge
    * round is a corpus-wide pair count plus a corpus-wide merge pass,
    * so at sf10 full training was the bench's biggest outlier (17× the
    * sf1 cost for 10× data) while pair STATISTICS converge long before
    * the full corpus is seen. Production tokenizers (BPE/SentencePiece)
    * train on a sample for exactly this reason; the sample being a
    * pure function of (doc_id, salt) keeps the learned vocabulary
    * rerun-stable and engine-portable — an oracle can reproduce the
    * exact subset, unlike rand()-sampling. */
  def trainMergesSampled(docs: DataFrame, textCol: Column, rounds: Int,
                         idCol: Column, sampleBps: Int, salt: String): DataFrame = {
    require(sampleBps > 0 && sampleBps <= 10000, "sampleBps in (0, 10000]")
    trainMerges(
      docs.filter(Sampling.hashBucket(idCol, salt) < sampleBps),
      textCol, rounds)
  }

  /** The corpus re-encoded with `rounds` learned merges:
    * (doc_id, toks). */
  def encode(docs: DataFrame, textCol: Column, rounds: Int): DataFrame =
    train(docs, textCol, rounds)._2
}
