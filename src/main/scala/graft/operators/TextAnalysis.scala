package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFns._

/** Text analysis for a training-data pipeline: per-document quality stats,
  * corpus composition, n-gram-heuristic language ID, and rolling-hash
  * document fingerprints. All operators are single-pass, partition-parallel
  * map/agg pipelines (no driver-side loops, no UDFs).
  */
object TextAnalysis {

  /** Tiny built-in stopword profiles for the language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de"),
    "es" -> Seq("el", "la", "los", "que", "y", "es", "un", "una"))

  /** Per-document quality stats: token count, stopword ratio, average token
    * length — the cheap text-quality signals a filtering pipeline keys on. */
  def textStats(docs: DataFrame, stopSet: Seq[String]): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      hitCount(toks, stopSet).as("n_stopwords"),
      length(regexp_replace(col("text"), " ", "")).cast("long").as("n_letters"))
      .withColumn("stopword_ratio", col("n_stopwords") / col("n_tokens"))
      .withColumn("avg_token_len", col("n_letters") / col("n_tokens"))
  }

  /** Corpus composition: per (lang, source) counts and length stats. */
  def langSourceStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        avg(col("n_chars")).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  /** N-gram (stopword-profile) language ID: score each document against
    * each language's stopword list; predict the best-scoring language or
    * 'und' when nothing hits. Deterministic tie-break by language code. */
  def langIdPredictions(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val hitCols = stopwords.toSeq.sortBy(_._1).map { case (l, set) =>
      hitCount(toks, set).as(s"hits_$l")
    }
    val scored = docs.select(col("doc_id") +: col("lang") +: hitCols: _*)
    // argmax over the per-language hit counts; ties go to the
    // lexicographically first language; all-zero → 'und'
    val langs = stopwords.keys.toSeq.sorted
    val best = langs.map(l => col(s"hits_$l")).reduce((a, b) => greatest(a, b))
    val pred = langs.reverse.foldLeft(lit("und")) { case (acc, l) =>
      when(col(s"hits_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    scored.withColumn("pred_lang", pred).drop(langs.map(l => s"hits_$l"): _*)
  }

  /** Language-ID confusion matrix: actual lang × predicted lang counts. */
  def langIdConfusion(docs: DataFrame): DataFrame =
    langIdPredictions(docs)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** Document fingerprint: concatenation of the k lexicographically
    * smallest shingle hashes (winnowing-style content signature, robust to
    * local edits). One explode + one agg; fingerprint is 32·k hex chars. */
  def fingerprints(docs: DataFrame, k: Int): DataFrame = {
    val sh = Shingles.table(docs)
      .select(col("doc_id"), md5(col("shingle")).as("h"))
    sh.groupBy(col("doc_id"))
      .agg(concat_ws("", slice(sort_array(collect_list(col("h"))), 1, k))
        .as("fingerprint"))
  }

  /** Canonical text normalization for dedup keys: Unicode NFC (custom
    * codegen'd expression — Spark has no built-in), lowercase, punctuation
    * stripped to spaces, whitespace collapsed and trimmed. Hashing the
    * normalized form makes exact dedup robust to the encoding/casing/
    * spacing noise that splits otherwise-identical documents. Pure
    * per-row projection, fully codegen'd. */
  def normalizeText(text: Column): Column = {
    // NfcNormalize also lowercases (SIMPLE per-codepoint mapping —
    // Spark's lower() applies full casing, which diverges from
    // utf8proc engines on final sigma / dotted İ)
    val nfcLower = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.NfcNormalize(
        org.apache.spark.sql.GraftSqlBridge.expression(text)))
    // \p{L} keeps letters of every script (stripping to ASCII would
    // delete accented/CJK text wholesale); both Java regex and DuckDB's
    // RE2 support the property class
    trim(regexp_replace(
      regexp_replace(nfcLower, "[^0-9\\p{L}\\s]", " "), "\\s+", " "))
  }

  /** Intra-document repetition ratio — the duplicate-3-gram fraction
    * quality signal (boilerplate / keyword-stuffed / looping text scores
    * high): 1 − distinct_shingles / total_shingles. Uses the generator's
    * per-doc dedup for the distinct count; total is len(tokens) − 2.
    * Docs with < 3 tokens are excluded (no shingles to judge).
    * One generate + one hash agg — same shuffle shape as textStats. */
  def repetitionRatio(docs: DataFrame): DataFrame = {
    val distinct = Shingles.table(docs)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_distinct"))
    docs.select(col("doc_id"),
        (size(tokens(col("text"))) - 2).cast("long").as("n_total"))
      .filter(col("n_total") > 0)
      .join(distinct, Seq("doc_id"))
      .withColumn("rep_ratio", lit(1.0) - col("n_distinct") / col("n_total"))
  }

  /** Fixed-size overlapping token windows — the chunking step that
    * turns documents into embedding/context-window-sized pieces
    * (size `chunkSize` tokens, step `stride`; overlap = size − stride).
    * Pure generate + per-row projection: `sequence` enumerates chunk
    * starts, `slice` cuts the window — no UDF, no shuffle at all, and
    * output volume is ~|tokens|·(size/stride), a constant factor of
    * the input, so the op is a narrow map at any corpus scale.
    * Output: (doc_id, chunk_id, n_tokens, chunk_hash md5-of-text) —
    * the hash stands in for the chunk body in fixtures; callers
    * wanting the text itself take `concat_ws(" ", slice(...))`
    * directly. Every document emits at least one chunk (a doc shorter
    * than `chunkSize` is its own chunk). */
  def chunkTokens(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    require(stride <= chunkSize, "stride > chunkSize would drop tokens between chunks")
    val toks = tokens(col("text"))
    docs
      .select(col("doc_id"), toks.as("__toks"),
        explode(sequence(lit(0), size(toks) - 1, lit(stride))).as("__start"))
      .select(col("doc_id"),
        (col("__start") / stride).cast("long").as("chunk_id"),
        slice(col("__toks"), col("__start") + 1, lit(chunkSize)).as("__chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("__chunk"))).as("chunk_hash"))
  }

  /** Regex scrub with audit trail — the PII-redaction shape (emails,
    * phone numbers, ids → a class token) every training-data pipeline
    * runs before release. Per-row projection only: `n_redacted` counts
    * the matches (regexp_extract_all) and `text` carries the scrubbed
    * body, so a downstream audit can aggregate redaction volume by
    * source without diffing text. The pattern must be valid in both
    * Java regex and RE2 (word boundaries, alternation, classes are —
    * lookarounds are not) so the oracle can state the identical scrub. */
  def redact(docs: DataFrame, pattern: String, replacement: String): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(pattern), lit(0)))
        .cast("long").as("n_redacted"),
      regexp_replace(col("text"), pattern, replacement).as("text"))

  /** Multi-category pattern audit in ONE corpus scan: each category's
    * match count is an independent `regexp_extract_all` projection over
    * the same row, then `stack` unpivots (category, count) pairs and a
    * per-(source, category) aggregate reports documents-hit and total
    * matches — the PII/compliance pre-scan run before a [[redact]]
    * pass, priced at one scan regardless of category count. Patterns
    * must stay in the Java∩RE2 common dialect (the q86 discipline) to
    * keep the audit engine-portable. Category names feed SQL
    * identifiers/literals: letters/digits/underscore only. */
  def multiPatternAudit(docs: DataFrame,
                        patterns: Seq[(String, String)]): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern category")
    require(patterns.forall(_._1.matches("[A-Za-z0-9_]+")),
      "category names must be [A-Za-z0-9_]+")
    val counted = docs.select(col("source") +: patterns.map { case (n, p) =>
      size(regexp_extract_all(col("text"), lit(p), lit(0)))
        .cast("long").as(s"__c_$n")
    }: _*)
    val stacked = counted.select(col("source"), expr(
      s"stack(${patterns.size}, " +
        patterns.map(p => s"'${p._1}', __c_${p._1}").mkString(", ") +
        ") AS (category, n)"))
    stacked.groupBy(col("source"), col("category"))
      .agg(count(when(col("n") > 0, 1)).as("n_docs_hit"),
        sum(col("n")).as("n_matches"))
  }

  /** The full curation decision, one row per document: every quality
    * signal as an explicit boolean REASON plus the final `keep` — the
    * auditable form a production filter wants (aggregate the reasons to
    * see what the filter is rejecting and why, re-run with different
    * thresholds without recomputing signals). Composes [[textStats]],
    * [[repetitionRatio]] (left join — docs with < 3 tokens have no
    * shingles; their repetition defaults to 0 because `too_short`
    * already covers them) and [[langIdPredictions]] on doc_id. */
  def curationDecision(docs: DataFrame, stopSet: Seq[String],
                       minTokens: Long, minStopRatio: Double,
                       maxRepRatio: Double): DataFrame = {
    val st = textStats(docs, stopSet)
      .select(col("doc_id"), col("n_tokens"), col("stopword_ratio"))
    val rep = repetitionRatio(docs).select(col("doc_id"), col("rep_ratio"))
    val lang = langIdPredictions(docs)
      .select(col("doc_id"), col("lang"), col("pred_lang"))
    val reasons = st.join(lang, "doc_id").join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_tokens") < minTokens).as("too_short"),
        (col("stopword_ratio") < minStopRatio).as("low_stopword"),
        (coalesce(col("rep_ratio"), lit(0.0)) > maxRepRatio).as("high_repetition"),
        (col("pred_lang") =!= col("lang")).as("lang_mismatch"))
    reasons.withColumn("keep",
      !(col("too_short") || col("low_stopword") ||
        col("high_repetition") || col("lang_mismatch")))
  }

  /** [[curationDecision]] as ONE join-free select — the STREAMING form:
    * every signal (token count, stopword ratio, distinct-shingle
    * repetition, stopword-profile lang-ID) is a pure column expression
    * over the doc row, so the decision is stateless on a stream (no
    * stream-stream self-join, no state store) and trivially identical
    * across micro-batch splits. Semantics are spec-pinned ≡ the batch
    * form: the 3-shingle set mirrors [[graft.functions.ShingleGenerator]]
    * (split on single spaces keeping empties, per-doc distinct), docs
    * with < 3 tokens take repetition 0 (the batch left-join coalesce).
    * The batch form stays the default for batch callers — its staged
    * shingle table is shared with the rest of the dedup family, where
    * this form would recompute. */
  def curationDecisionStateless(docs: DataFrame, stopSet: Seq[String],
                                minTokens: Long, minStopRatio: Double,
                                maxRepRatio: Double): DataFrame = {
    // LAYERED selects, each higher-order function evaluated exactly
    // ONCE as a named column: HOFs (filter/transform lambdas) run
    // interpreted (CodegenFallback), so an expression tree that
    // re-expands them — the lang argmax referencing every language's
    // hit count inside every WHEN branch — multiplies the per-row cost
    // ~25× (measured 378 s vs 18 s for the batch form at sf10 before
    // this layering). Downstream layers reference only SCALAR columns,
    // which Catalyst may inline for free; the non-cheap aliases stay
    // un-collapsed (CollapseProject duplicates only cheap expressions).
    val langs = stopwords.keys.toSeq.sorted
    val toksed = docs.select(col("doc_id"), col("source"), col("lang"),
      tokens(col("text")).as("__toks"))
    val t = col("__toks")
    val scoreCols = Seq(
      col("doc_id"), col("source"), col("lang"),
      size(t).cast("long").as("__n_tok"),
      hitCount(t, stopSet).as("__n_stop"),
      when(size(t) >= 3,
        size(array_distinct(transform(sequence(lit(0), size(t) - 3),
          i => concat_ws(" ", element_at(t, i + 1),
            element_at(t, i + 2), element_at(t, i + 3))))))
        .otherwise(lit(0)).cast("long").as("__n_distinct")) ++
      langs.map(l => hitCount(t, stopwords(l)).as(s"__hits_$l"))
    val scored = toksed.select(scoreCols: _*)
    val best = langs.map(l => col(s"__hits_$l")).reduce(greatest(_, _))
    val pred = langs.reverse.foldLeft(lit("und")) { case (acc, l) =>
      when(col(s"__hits_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    val nTotal = col("__n_tok") - 2
    val repRatio = when(nTotal > 0,
      lit(1.0) - col("__n_distinct") / nTotal).otherwise(lit(0.0))
    scored.select(col("doc_id"), col("source"),
        (col("__n_tok") < minTokens).as("too_short"),
        (col("__n_stop") / col("__n_tok") < minStopRatio).as("low_stopword"),
        (repRatio > maxRepRatio).as("high_repetition"),
        (pred =!= col("lang")).as("lang_mismatch"))
      .withColumn("keep",
        !(col("too_short") || col("low_stopword") ||
          col("high_repetition") || col("lang_mismatch")))
  }

  /** Word n-grams as rows: (doc_id, ngram) with the gram joined by
    * single spaces, one row per POSITION (duplicates preserved —
    * callers wanting per-doc gram SETS apply `.distinct()`). Same
    * generate+slice shape as [[chunkTokens]]: `sequence` enumerates
    * start positions, `slice` cuts the window — codegen'd end to end,
    * zero shuffles, output ≈ |tokens| rows per doc. Documents shorter
    * than n tokens emit nothing (no gram exists; `sequence` would
    * reject the descending bound). */
  def wordNgrams(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    val toks = tokens(col("text"))
    docs.select(col("doc_id"), toks.as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("__toks")) - (n - 1))).as("__p"),
        col("__toks"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("__toks"), col("__p"), lit(n))).as("ngram"))
  }

  /** Benchmark decontamination: per training document, how many of its
    * distinct word n-grams also appear anywhere in the EVAL corpus —
    * the overlap check every serious pretraining pipeline runs so test
    * sets don't leak into training data (the GPT-3/C4-style n-gram
    * collision rule). Output: (doc_id, n_grams, n_contaminated,
    * contamination ∈ [0,1]).
    *
    * Scale shape: the eval side is benchmark-sized (MBs) while train is
    * the 100 TB corpus, so the distinct eval-gram set is BROADCAST and
    * the whole check is a map-side hash probe over one generate pass —
    * no shuffle of the corpus at all; the only wide op is the per-doc
    * count agg. Train docs shorter than n tokens have no grams and drop
    * out (callers treat absent = 0 overlap). */
  def ngramContamination(train: DataFrame, evalDocs: DataFrame, n: Int): DataFrame = {
    val evalGrams = broadcast(
      wordNgrams(evalDocs, n).select(col("ngram")).distinct()
        .withColumn("__hit", lit(1L)))
    wordNgrams(train, n).distinct()
      .join(evalGrams, Seq("ngram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_contaminated"))
      .withColumn("contamination", col("n_contaminated") / col("n_grams"))
  }

  /** Corpus-wide adjacent-token pair frequencies — the statistic behind
    * the first BPE merge step (which pair to fuse next) and a cheap
    * collocation signal. [[wordNgrams]] at n = 2 feeding one hash agg:
    * generate → partial count → final count, the canonical map-side-
    * combine shape (pair cardinality ≪ pair occurrences, so the
    * shuffle carries the reduced table). */
  def adjacentPairCounts(docs: DataFrame): DataFrame =
    wordNgrams(docs, 2)
      .groupBy(col("ngram").as("pair"))
      .agg(count(lit(1)).as("n"))

  /** Token co-occurrence LIFT over a bounded vocabulary: for the
    * `vocabSize` highest-document-frequency tokens (ties broken by
    * token), every pair appearing together in ≥ `minPairDf` documents,
    * scored lift = N·df(a,b) / (df(a)·df(b)) — the association measure
    * PMI is the log of, kept in the ratio domain so the arithmetic is
    * integer-product + one correctly-rounded double division (`log`
    * is a libm call with no cross-engine rounding guarantee; the ratio
    * is engine-exact and order-isomorphic to PMI).
    *
    * Scale shape: the vocabulary is top-k-bounded and BROADCAST, so the
    * corpus scan reduces each document to its ≤ vocabSize member
    * tokens before the self-join on doc_id — pair fan-out is
    * ≤ C(vocabSize, 2) per document by construction, never |tokens|².
    * The global top-k window runs on the |vocab| ≪ |corpus| df table. */
  def cooccurrenceLift(docs: DataFrame, vocabSize: Int, minPairDf: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dt = docs.select(col("doc_id"),
      explode(array_distinct(tokens(col("text")))).as("tok"))
    val dfTab = dt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // post-agg global window over |distinct tokens| rows (same class as
    // the Pareto ranks — never over the corpus scan)
    val vocab = dfTab
      .withColumn("__rn", row_number().over(
        Window.orderBy(col("df").desc, col("tok").asc)))
      .filter(col("__rn") <= vocabSize).drop("__rn")
    val vt = dt.join(broadcast(vocab), "tok")
    val nDocs = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    vt.select(col("doc_id"), col("tok").as("tok_a"), col("df").as("df_a"))
      .join(vt.select(col("doc_id"), col("tok").as("tok_b"), col("df").as("df_b")),
        "doc_id")
      .filter(col("tok_a") < col("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"), col("df_a"), col("df_b"))
      .agg(count(lit(1)).as("df_ab"))
      .filter(col("df_ab") >= minPairDf)
      .crossJoin(nDocs)
      // exact integer products (≤ 2⁵³ for any df ≤ n_docs ≤ ~9·10⁷ per
      // side at once — far past benchmark vocab scale), one correctly-
      // rounded IEEE division: identical in every engine
      .withColumn("lift", (col("df_ab") * col("n_docs")).cast("double") /
        (col("df_a") * col("df_b")).cast("double"))
  }

  /** Per-document token DIVERSITY as Gini impurity: 1 − Σᵢ(cᵢ/T)² over
    * the token frequency distribution (cᵢ = count of token i, T total
    * tokens). The entropy-family repetitiveness signal — low diversity
    * = the doc hammers few tokens — chosen in the Gini form because it
    * is pure RATIONAL arithmetic: Σcᵢ² and T are exact integers, the
    * single division is IEEE-correctly-rounded, so the score is
    * engine-exact (Shannon entropy would drag in `log`, a libm call
    * with no cross-engine rounding guarantee). Complements
    * [[repetitionRatio]] (3-gram structure) with unigram concentration.
    * Two hash aggs keyed by doc: explode → per-(doc,token) count →
    * per-doc moment — both map-side combinable. */
  def tokenGini(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * col("c")).as("__ssq"))
      .withColumn("gini", lit(1.0) - col("__ssq").cast("double") /
        (col("n_tokens") * col("n_tokens")).cast("double"))
      .drop("__ssq")

  /** Pairwise vocabulary Jaccard between corpus slices (sources,
    * languages, snapshots): |Vₐ ∩ V_b| / |Vₐ ∪ V_b| for every unordered
    * group pair — the corpus-audit matrix that shows which sources are
    * near-mirrors of each other BEFORE any per-document dedup runs.
    * Exact integer set sizes, one final correctly-rounded division.
    *
    * Scale shape: the (group, token) distinct table is the inverted
    * index; the self-join on token fans out |groups-sharing-token|² per
    * token, bounded by |groups|² — groups are sources/shards (hundreds,
    * not millions), so the pair table is tiny even when the corpus is
    * 100 TB. Stopword-class tokens dominate the join input; a df cap
    * (drop tokens present in every group — they contribute to every
    * intersection equally) is the standard trim if |groups| grows. */
  /** Unigram language-model scoring: each document's mean token
    * log-probability under the CORPUS unigram distribution — the
    * perplexity-proxy quality signal of pretraining pipelines (rare-junk
    * documents score far below fluent text; the actual filter thresholds
    * on this column). p(t) = count(t)/T over all token OCCURRENCES.
    *
    * Shape: one corpus scan → token counts (map-side combinable), the
    * per-token lp = dec6(ln count − ln T) joined back into the exploded
    * tokens — the LM table is vocabulary-sized; at web scale it is the
    * natural broadcast/bucketed-join side. Every token is in the LM by
    * construction (scored corpus = training corpus); scoring a DIFFERENT
    * corpus needs the OOV handling of [[ngramContamination]]'s probe
    * join instead. ln is rounded once per token type at DECIMAL(18,6)
    * (±1-ulp license, same idiom as BM25), then per-doc sums are exact
    * decimal — order-free, bit-portable.
    *
    * Output: doc_id, n_tokens, avg_logprob (6-dp). */
  def unigramLogprob(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tk"))
    val counts = toks.groupBy(col("tk")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("t_total"))
    val lm = counts.crossJoin(broadcast(total))
      .select(col("tk"),
        (log(col("cnt").cast("double")) - log(col("t_total").cast("double")))
          .cast(DecimalType(18, 6)).as("lp"))
    toks.join(lm, Seq("tk"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("lp")).cast("double") / count(lit(1))).as("__m"))
      .select(col("doc_id"), col("n_tokens"),
        graft.engine.Aggregates.round6Portable(col("__m")).as("avg_logprob"))
  }

  /** Corpus-relative perplexity bucketing — the CCNet-style head/middle/
    * tail split (Wenzek et al. 2020, "CCNet: Extracting High Quality
    * Monolingual Datasets from Web Crawl Data") generalized to `k`
    * quantile buckets over the [[unigramLogprob]] score: each document's
    * 6-dp portable avg token log-probability places it in the corpus's
    * own score distribution, and buckets split that distribution into
    * k cumulative-count slices. Bucket 1 = lowest avg logprob = most
    * surprising under the corpus LM (the "tail" a curation pipeline
    * inspects first); bucket k = most predictable ("head").
    *
    * Like the round-9 shingle-df band, the assignment is derived from a
    * VALUE HISTOGRAM, not a per-row global window: scores collapse to
    * their distinct 6-dp classes (bounded by the score domain at 6 dp,
    * NOT by corpus size), the cumulative window runs over that class
    * table, and a whole class lands in the bucket its cumulative END
    * count selects — bucket = (cum−1)·k DIV n + 1, exact integers, so
    * both engines agree bit for bit and no corpus-sized single-partition
    * sort exists anywhere in the plan. Ties at a bucket boundary
    * therefore stay together (bucket sizes are ~n/k, exact when no 6-dp
    * class straddles). Output: k rows of census stats. */
  def perplexityBuckets(docs: DataFrame, k: Int): DataFrame =
    scoreClassBuckets(unigramLogprob(docs), k)
      .groupBy(col("bucket"))
      .agg(sum(col("__c")).as("n_docs"),
        min(col("avg_logprob")).as("lo_logprob"),
        max(col("avg_logprob")).as("hi_logprob"),
        graft.engine.Aggregates.round6Portable(
          sum(col("__t")).cast("double") / sum(col("__c"))).as("avg_tokens"))
      .orderBy(col("bucket").asc)

  /** The bucketed 6-dp score-CLASS table shared by the census rollup
    * ([[perplexityBuckets]]) and the per-doc assignment
    * ([[perplexityBucketOf]]): one row per distinct avg_logprob with
    * its doc count, token sum, and bucket — bounded by the score
    * domain at 6 dp, never by corpus size. */
  private def scoreClassBuckets(lp: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "need at least two buckets")
    import org.apache.spark.sql.expressions.Window
    val cls = lp.groupBy(col("avg_logprob"))
      .agg(count(lit(1)).as("__c"), sum(col("n_tokens")).as("__t"))
    val wCum = Window.orderBy(col("avg_logprob").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    cls.select(col("avg_logprob"), col("__c"), col("__t"),
        sum(col("__c")).over(wCum).as("__cum"),
        sum(col("__c")).over(wAll).as("__n"))
      .withColumn("bucket", expr(s"((__cum - 1) * $k DIV __n) + 1"))
  }

  /** Per-document perplexity-bucket assignment: (doc_id, avg_logprob,
    * bucket) — the class table's bucket joined back to each doc by its
    * 6-dp score class. The class table is score-domain-bounded, so the
    * join BROADCASTS and the per-doc side never shuffles; this is the
    * form a curation filter consumes (drop bucket ≤ tail), while
    * [[perplexityBuckets]] stays the census report. */
  def perplexityBucketOf(docs: DataFrame, k: Int): DataFrame = {
    // staged: the logprob table feeds BOTH the class derivation and the
    // per-doc join side — unmaterialized, the corpus-wide LM subtree
    // (two scans + a token join) would run twice
    val lp = graft.engine.Staging.stagedByPlan(unigramLogprob(docs), "ppl_lp")
    lp.join(
        broadcast(scoreClassBuckets(lp, k)
          .select(col("avg_logprob"), col("bucket"))),
        Seq("avg_logprob"))
      .select(col("doc_id"), col("avg_logprob"), col("bucket"))
  }

  /** Per-document duplicated-substring fraction — the exact-substring
    * dedup primitive of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better": substrings repeated anywhere in the
    * corpus are memorization fuel) scaled to a per-doc audit metric:
    * the fraction of a document's n-gram POSITIONS whose n-gram occurs
    * ≥ 2 times corpus-wide (multiplicity counts — a doc repeating its
    * own phrase is self-duplication, which is why positions, not the
    * distinct-shingle table, are the unit here; [[Shingles]] dedupes
    * within doc and cannot express this).
    *
    * Shape: tokens posexplode → per-doc lead() window builds the n-gram
    * at every position (window partitioned BY DOC — parallel, no global
    * sort) → the position table is staged (it feeds the global
    * occurrence count AND the per-doc rollup) → one equi-join on the
    * gram. Linear in corpus tokens; the occurrence-count agg is the
    * only corpus-wide shuffle. Docs with < n tokens have no positions
    * and are absent (both engines). */
  def dupSpanStats(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 2, "spans below 2 tokens are single tokens")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val toks = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tk")))
    // all lead columns materialize BEFORE the tail filter — a lead
    // computed after filtering would skip the dropped positions
    val withLeads = (1 until n).foldLeft(toks) { (d, i) =>
      d.withColumn(s"__l$i", lead(col("tk"), i).over(w))
    }
    val grams = Shingles.shared(
      withLeads.filter(col(s"__l${n - 1}").isNotNull)
        .select(col("doc_id"), concat_ws(" ",
          col("tk") +: (1 until n).map(i => col(s"__l$i")): _*).as("gram")))
    val occ = grams.groupBy(col("gram")).agg(count(lit(1)).as("__occ"))
    grams.join(occ, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__occ") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        graft.engine.Aggregates.round6Portable(
          col("n_dup").cast("double") / col("n_grams")).as("dup_frac"))
  }

  /** Duplicate-span REMOVAL — the production form of the Lee et al. 2022
    * exact-substring dedup that [[dupSpanStats]] only measures: rewrite
    * every document with its corpus-duplicated spans CUT OUT. A token
    * position is removed when it is covered by any n-gram (starting at
    * any of the n positions ending at it) that occurs ≥ 2 times
    * corpus-wide — multiplicity counts, so a doc repeating its own
    * boilerplate loses both copies, exactly the memorization-fuel
    * definition.
    *
    * Shape (reference: Lee et al. use a suffix array; position n-grams
    * are the shuffle-native equivalent at a fixed span width):
    *   1. token positions (posexplode) — staged, referenced twice
    *      (gram construction AND final reconstruction);
    *   2. per-doc lead() windows build the n-gram at every start
    *      (partitioned BY DOC — parallel, no global sort);
    *   3. ONE corpus-wide shuffle: the gram-occurrence count;
    *   4. duplicated starts broadcast coverage forward n−1 positions
    *      via a per-doc ROWS window max (positions are dense per doc,
    *      so ROWS ≡ RANGE);
    *   5. per-doc rebuild: sorted collect of the surviving tokens.
    * The collect_list is per-DOC (document-sized, the same bound every
    * text operator here lives under), never corpus-sized. Docs shorter
    * than n tokens have no grams, hence no coverage — they pass through
    * verbatim, never dropped. A fully-duplicated doc yields
    * cleaned = '' (present, empty — the caller decides whether an
    * emptied doc is then dropped; this operator only rewrites). */
  def dedupSpans(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 2, "spans below 2 tokens are single tokens")
    import org.apache.spark.sql.expressions.Window
    val wLead = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val toks = Shingles.shared(docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tk"))))
    val withLeads = (1 until n).foldLeft(toks) { (d, i) =>
      d.withColumn(s"__l$i", lead(col("tk"), i).over(wLead))
    }
    val grams = Shingles.shared(
      withLeads.filter(col(s"__l${n - 1}").isNotNull)
        .select(col("doc_id"), col("pos"), concat_ws(" ",
          col("tk") +: (1 until n).map(i => col(s"__l$i")): _*).as("gram")))
    val occ = grams.groupBy(col("gram")).agg(count(lit(1)).as("__occ"))
    val dupStarts = grams.join(occ, Seq("gram"))
      .filter(col("__occ") >= 2)
      .select(col("doc_id"), col("pos"), lit(1L).as("__dup"))
    // left join keeps EVERY token position; coverage = any duplicated
    // start within the trailing n-1 positions (inclusive of self)
    val wCov = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
      .rowsBetween(-(n - 1), Window.currentRow)
    val covered = toks.join(dupStarts, Seq("doc_id", "pos"), "left")
      .withColumn("__cov", max(coalesce(col("__dup"), lit(0L))).over(wCov))
    covered.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__cov")).as("n_removed"),
        array_join(transform(array_sort(collect_list(
            when(col("__cov") === 0, struct(col("pos"), col("tk"))))),
          s => s.getField("tk")), " ").as("cleaned"))
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        col("cleaned"))
  }

  /** Every token position with its duplication-coverage flag and its
    * maximal same-flag RUN — the shared substrate of the
    * variable-length span family ([[dupSpanIntervals]],
    * [[dedupSpansMinLen]]). Coverage is [[dedupSpans]]'s definition
    * (any duplicated n-gram start within the trailing n−1 positions);
    * runs are gaps-and-islands over the per-doc position order: a new
    * run opens whenever the flag CHANGES (lag ≠ current, first row
    * included via the null-≠ fallthrough), so a maximal run of covered
    * positions IS a maximal merged duplicated span — the union of
    * overlapping/adjacent [p, p+n−1] coverage intervals — and its row
    * count is the TRUE span length Lee et al.'s production rule
    * thresholds on. Every window partitions by doc (or finer); the
    * gram-occurrence count stays the one corpus-wide shuffle. The
    * toks/grams subtrees are the IDENTICAL staged tables
    * [[dedupSpans]] lands, so running q204 and the interval queries in
    * one process builds them once. */
  private def coverageRuns(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 2, "spans below 2 tokens are single tokens")
    import org.apache.spark.sql.expressions.Window
    val wLead = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val toks = Shingles.shared(docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tk"))))
    val withLeads = (1 until n).foldLeft(toks) { (d, i) =>
      d.withColumn(s"__l$i", lead(col("tk"), i).over(wLead))
    }
    val grams = Shingles.shared(
      withLeads.filter(col(s"__l${n - 1}").isNotNull)
        .select(col("doc_id"), col("pos"), concat_ws(" ",
          col("tk") +: (1 until n).map(i => col(s"__l$i")): _*).as("gram")))
    val occ = grams.groupBy(col("gram")).agg(count(lit(1)).as("__occ"))
    val dupStarts = grams.join(occ, Seq("gram"))
      .filter(col("__occ") >= 2)
      .select(col("doc_id"), col("pos"), lit(1L).as("__dup"))
    val wCov = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
      .rowsBetween(-(n - 1), Window.currentRow)
    val wPos = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val covered = toks.join(dupStarts, Seq("doc_id", "pos"), "left")
      .withColumn("__cov", max(coalesce(col("__dup"), lit(0L))).over(wCov))
    covered
      .withColumn("__new",
        when(col("__cov") === lag(col("__cov"), 1).over(wPos), 0L)
          .otherwise(1L))
      .withColumn("__grp", sum(col("__new")).over(
        wPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__runlen", count(lit(1)).over(
        Window.partitionBy(col("doc_id"), col("__grp"))))
      .select(col("doc_id"), col("pos"), col("tk"), col("__cov"),
        col("__grp"), col("__runlen"))
  }

  /** MAXIMAL corpus-duplicated span intervals — the variable-length
    * report [[dupSpanStats]] cannot give (it counts positions, not
    * spans) and [[dedupSpans]] does not need (it removes everything
    * covered): one row per maximal merged duplicated span with its
    * 0-based start and TRUE token length. This is the table a curation
    * run tunes its length threshold on — Lee et al. 2022 target runs
    * ≥ 50 tokens; adjacent duplicated n-gram starts merge into one
    * interval here exactly as their suffix-array runs do at fixed
    * width (reference analog: the dedup intent of check_duplicates.py
    * generalized to positions). Output is bounded by the number of
    * maximal spans ≤ positions/n. */
  def dupSpanIntervals(docs: DataFrame, n: Int): DataFrame =
    coverageRuns(docs, n).filter(col("__cov") === 1)
      .groupBy(col("doc_id"), col("__grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        count(lit(1)).as("span_len"))
      .select(col("doc_id"), col("span_start"), col("span_len"))

  /** [[dedupSpans]] behind a LENGTH KNOB — the production Lee et al.
    * rule: only maximal merged spans of at least `minLen` tokens are
    * cut out, so short organic repeats (an idiom, a name) survive
    * while long duplicated runs (boilerplate, mirrored passages) go.
    * `minLen` ≤ n degenerates to [[dedupSpans]] (every covered run is
    * ≥ n tokens by construction — property-pinned). Same per-doc
    * window discipline and single corpus shuffle as the fixed form;
    * emits the same (doc_id, n_tokens, n_removed, cleaned) census. */
  def dedupSpansMinLen(docs: DataFrame, n: Int, minLen: Int): DataFrame = {
    require(minLen >= 1, "a span threshold below 1 removes nothing")
    coverageRuns(docs, n)
      .withColumn("__rm",
        (col("__cov") === 1) && (col("__runlen") >= minLen))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__rm"), 1L).otherwise(0L)).as("n_removed"),
        array_join(transform(array_sort(collect_list(
            when(!col("__rm"), struct(col("pos"), col("tk"))))),
          s => s.getField("tk")), " ").as("cleaned"))
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        col("cleaned"))
  }

  /** Corpus QUALITY SCORECARD — the per-source report a curation run
    * publishes, rolled up from four independent quality operators in
    * one frame: stopword ratio ([[textStats]]), unigram-LM score
    * ([[unigramLogprob]]), duplicated-substring fraction
    * ([[dupSpanStats]]), and naive-Bayes self-classification accuracy
    * ([[Classify.naiveBayesPredictions]]). Every per-doc signal is
    * pinned by the portable floor-round and carried through
    * DECIMAL(18,6) exact sums, so each source's averages are
    * merge-order-free and hash-identical across engines. Inner joins
    * throughout: a doc must carry every signal to enter the report.
    * Shared by the q200 gate and [[graft.Pipeline]]'s published
    * scorecard (same arithmetic, different corpus slice). */
  def qualityScorecard(docs: DataFrame, stopSet: Seq[String],
                       dupSpanN: Int, nbBuckets: Int,
                       nbSalt: String): DataFrame = {
    val dec6 = DecimalType(18, 6)
    val sw = textStats(docs, stopSet)
      .select(col("doc_id"),
        graft.engine.Aggregates.round6Portable(col("stopword_ratio"))
          .cast(dec6).as("sw6"))
    val lm = unigramLogprob(docs)
      .select(col("doc_id"), col("avg_logprob").cast(dec6).as("lp6"))
    val dup = dupSpanStats(docs, dupSpanN)
      .select(col("doc_id"), col("dup_frac").cast(dec6).as("df6"))
    val pred = Classify.naiveBayesPredictions(docs, nbBuckets, nbSalt)
      .select(col("doc_id"), col("pred_source"))
    def avg6(c: Column): Column =
      graft.engine.Aggregates.round6Portable(
        sum(c).cast("double") / count(lit(1)))
    docs.select(col("doc_id"), col("source"))
      .join(sw, Seq("doc_id")).join(lm, Seq("doc_id"))
      .join(dup, Seq("doc_id")).join(pred, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        avg6(col("sw6")).as("avg_stopword_ratio"),
        avg6(col("lp6")).as("avg_logprob"),
        avg6(col("df6")).as("avg_dup_frac"),
        avg6(when(col("pred_source") === col("source"), 1L).otherwise(0L)
          .cast(dec6)).as("nb_self_acc"))
      .orderBy(col("source").asc)
  }

  def vocabJaccardMatrix(docs: DataFrame, groupCol: String): DataFrame = {
    val gt = docs.select(col(groupCol).as("g"),
        explode(array_distinct(tokens(col("text")))).as("tok"))
      .distinct()
    val sizes = gt.groupBy(col("g")).agg(count(lit(1)).as("vsize"))
    val inter = gt.select(col("g").as("g_a"), col("tok"))
      .join(gt.select(col("g").as("g_b"), col("tok")), "tok")
      .filter(col("g_a") < col("g_b"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("g").as("g_a"), col("vsize").as("size_a")), "g_a")
      .join(sizes.select(col("g").as("g_b"), col("vsize").as("size_b")), "g_b")
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("size_a") + col("size_b") - col("n_common")).cast("double"))
  }
}
