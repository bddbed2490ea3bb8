package graft

import graft.operators.NearDup

/** Every tuning knob of the near-dup / containment / generator-audit
  * family, defined EXACTLY ONCE and interpolated into both the engine
  * calls and the generated oracle SQL — the same shared-constant
  * contract that [[SparkEntry]] established for the simhash hamming
  * threshold in round 8, widened to the whole dedup surface. A knob
  * that exists in two places can drift apart silently (the gate would
  * still be green, because each side would be self-consistently
  * wrong); a knob that exists here moves both sides together or not at
  * all. Construction-time `require`s pin the cross-knob invariants, so
  * an impossible combination fails at catalog load, not deep inside a
  * campaign.
  */
private[graft] object DedupKnobs {

  /** MinHash/LSH shape parameters (shared with the generated oracle SQL). */
  val MinhashK = 12
  val LshBands = 4
  val LshRows = 3
  require(LshBands * LshRows <= MinhashK,
    s"LSH needs bands*rows (${LshBands * LshRows}) <= signature length ($MinhashK)")

  /** Per-(band, bucket) population cap for the skew-hardened LSH path
    * (q163): small enough that the planted-flood spec exercises the
    * star reduction, far above any bucket the organic fixtures fill. */
  val LshBucketCap = 8L

  /** Hamming threshold for EVERY simhash near-dup pair surface — the
    * q23/q50/q166/q167 pair queries, the staged pair table the
    * cluster/survivor/graph family consumes, and every oracle SQL
    * mirror. The band joins' pigeonhole recall guarantee requires it to
    * stay strictly below [[NearDup.SimHashBands]]. */
  val SimHashMaxHamming = 3
  require(SimHashMaxHamming < NearDup.SimHashBands,
    s"simhash band-join recall needs maxHamming ($SimHashMaxHamming) < " +
      s"bands (${NearDup.SimHashBands})")

  /** Per-(band, band-value) population cap for the capped simhash pair
    * paths (q166/q167): same role as [[LshBucketCap]]. */
  val SimHashBucketCap = 8L

  /** q24's n-gram Jaccard pair threshold (engine call + oracle WHERE). */
  val PairMinJaccard = 0.02

  /** Directional-containment threshold for the quote/provenance family
    * (q118/q187/q194) — applied to the UNROUNDED ratio on both sides. */
  val MinContainment = 0.8
  require(MinContainment > 0 && MinContainment <= 1,
    s"containment threshold must be in (0,1], got $MinContainment")

  /** Corpus-relative shingle-df band for the containment family,
    * replacing round 2–8's fixed `maxShingleDf = 50` literal (which
    * went VACUOUS at sf10: the synthetic template pool saturates, every
    * repeated shingle's df lands in [771, 1025], the fixed band empties
    * and the quote detector returns 0 rows exactly where a mirror-site
    * audit has the most to find — measured, SCALE.md round 8/9). The
    * band keeps shingles with df ≤ bmax where
    *
    *   bmax = min(fanout-budget threshold, max(Floor, quantile)):
    *
    *  - quantile: the [[ShingleDfQuantileBp]]-quantile (exact order
    *    statistic, integer basis-point arithmetic — no interpolation,
    *    so the value is engine-portable) of the df distribution over
    *    REPEATED shingles (df ≥ 2; singletons can never intersect).
    *    Cuts the boilerplate tail corpus-relatively on corpora that
    *    have one.
    *  - fanout-budget threshold: the largest df t such that
    *    Σ_{df' ≤ t} count(df')·df'² ≤ [[ShingleDfFanoutBudget]] — the
    *    EXACT candidate-row count of the postings self-join below t.
    *    A count-quantile alone re-opens the Σdf² explosion the fixed
    *    band existed to prevent (at sf10, p90 alone keeps 2.4·10¹⁰
    *    join rows — measured); budgeting the fan-out keeps the RAREST
    *    (most containment-informative) shingles up to a hard candidate
    *    bound at ANY corpus, saturation included — it binds even below
    *    the Floor, with exactly one exception: the rarest repeated df
    *    class is always kept, so the candidate set cannot go empty
    *    while any repeated shingle exists (a corpus whose rarest class
    *    alone exceeds the budget therefore exceeds it by that class).
    *  - Floor: lifts the QUANTILE arm only — the quantile never cuts
    *    below it, so small/sparse corpora (every gate SF: max df at
    *    sf0.1 is 25) keep every shingle, preserving the exact-audit
    *    regime there.
    */
  val ShingleDfQuantileBp = 9000
  require(0 < ShingleDfQuantileBp && ShingleDfQuantileBp <= 10000,
    s"df quantile must be basis points in (0, 10000], got $ShingleDfQuantileBp")
  val ShingleDfFloor = 50L
  require(ShingleDfFloor >= 2, s"df floor below 2 bands out even first repeats")
  val ShingleDfFanoutBudget = 200000000L
  require(ShingleDfFanoutBudget >= ShingleDfFloor * ShingleDfFloor,
    "fan-out budget must admit at least one floor-df shingle")

  /** Top-k per doc_a for the flood-safe containment twin (q194): the
    * dumpable form of the quote audit in the saturation regime, where
    * the uncapped pair set is O(dup-cluster²) (107M rows at sf10 —
    * measured). */
  val ContainTopK = 5
  require(ContainTopK >= 1, "top-k must keep at least one match")

  /** Hamming threshold for perceptual-hash image near-dup classes
    * (q199): the 4-band × 12-bit band join is pigeonhole-exact only
    * below 4. */
  val PHashMaxHamming = 3
  require(PHashMaxHamming >= 0 && PHashMaxHamming < 4,
    s"pHash band recall needs maxHamming in [0, 4), got $PHashMaxHamming")

  /** Per-(width, height, band, value) CLASS-population cap for the
    * capped pHash pair path (q201): same role as [[SimHashBucketCap]],
    * guarding the regime where distinct-hash count approaches |images|
    * and the class join degrades to the raw pair join. */
  val PHashClassBucketCap = 8L

  /** Resample grid for the standard-aHash arm (q202): the classic 8×8
    * — 64 bits, stored as two 32-bit halves so no engine touches a
    * BIGINT sign bit. */
  val PHashGrid = 8
  require(PHashGrid >= 2 && PHashGrid * PHashGrid <= 64,
    s"resample grid must pack into 64 bits, got $PHashGrid")

  /** Audio envelope-fingerprint sub-window count (q206/q207): 16 equal
    * length-relative index ranges → a 15-bit Haitsma-Kalker
    * sign-of-energy-delta fingerprint. */
  val AudioFpSubWindows = 16
  require(AudioFpSubWindows >= 2 && AudioFpSubWindows <= 32,
    s"fingerprint bits must pack a long half, got $AudioFpSubWindows")

  /** Frequency-proxy band count for the MULTI-BAND Haitsma-Kalker
    * fingerprint (q216/q217 and the pipeline's audio arm): band 0 is
    * the envelope, bands 1..B−1 are lag-b first differences —
    * (subWindows − 1) × bands = 60 sign-of-delta bits in two 32-bit
    * halves, wide enough that identical fingerprints are duplication
    * evidence at any realistic corpus size (the round-11 saturation
    * lesson: the 15-bit envelope alone birthday-collides at sf10). */
  val AudioFpBands = 4
  require(AudioFpBands >= 1 && (AudioFpSubWindows - 1) * AudioFpBands <= 64,
    s"multiband fingerprint must pack 64 bits, got " +
      s"${(AudioFpSubWindows - 1) * AudioFpBands}")

  /** Band count for the WIDE frame-matrix fingerprint (q222/q223):
    * envelope + lag-1..8 comb energies → (16−1)×9 = 135 sign-of-delta
    * bits in five 32-bit words — the ≥128-bit production-width form
    * (Haitsma-Kalker's shape is a per-frame 32-bit matrix) for
    * corpora where even 60 bits birthday-collides: at 10⁹–10¹⁰
    * recordings a 2⁶⁰ space expects ~2³⁰ collisions, while 2¹³⁵
    * expects none. The 64-bit multi-band form stays the fixture-scale
    * pipeline arm; this is its widening path, and its first two words
    * ARE the multi-band halves (spec-pinned), so the forms agree
    * where they overlap. */
  val AudioFpWideBands = 9

  /** Word width of the wide fingerprint: 15 bits per word makes the
    * word count exactly (16−1)×9 / 15 = 9 AND aligns words to whole
    * (band, sub-window-delta) rows — so words 0..3 concatenated ARE
    * the 60-bit multi-band fingerprint (fp_hi‖fp_lo), a spec-pinned
    * cross-validation between the two forms. */
  val AudioFpWideWordBits = 15
  require((AudioFpSubWindows - 1) * AudioFpWideBands
      % AudioFpWideWordBits == 0,
    "wide words must tile the bit matrix exactly")

  /** Words of the wide fingerprint (15 bits each — small non-negative
    * ints, cheap band-bucket keys). */
  val AudioFpWideWords =
    (AudioFpSubWindows - 1) * AudioFpWideBands / AudioFpWideWordBits
  require(AudioFpWideWords >= 2, "a wide form needs at least two words")

  /** Hamming threshold for the wide class pairs: banding on the nine
    * words is pigeonhole-exact below 9; 8 admits the planted near
    * twins (the 60-bit form measures most at 1–3 with a ≤7 tail; the
    * 2.25× wider matrix flips proportionally more margin-limited
    * bits) while 135-bit entropy keeps accidental cross-class matches
    * negligible (~2⁻⁹⁰ per pair). */
  val AudioWideMaxHamming = 8
  require(AudioWideMaxHamming >= 0 && AudioWideMaxHamming < AudioFpWideWords,
    s"wide band recall needs maxHamming < $AudioFpWideWords words")

  /** Hamming threshold for the MULTI-BAND audio class pairs (q217 and
    * the pipeline's audio arm): the 4×16-bit band machinery is
    * pigeonhole-exact below 4, and 3 admits the planted near twins
    * (one-sample re-encode noise — most land at hamming 1–3, measured)
    * while 60-bit fingerprint entropy keeps accidental cross-class
    * matches at ~2⁻⁴⁴ per pair. */
  val AudioMbMaxHamming = 3
  require(AudioMbMaxHamming >= 0 && AudioMbMaxHamming < 4,
    s"multiband band recall needs maxHamming in [0, 4), got $AudioMbMaxHamming")

  /** Hamming threshold for audio fingerprint near-dup classes (q207):
    * the 2-band × 8-bit band join is pigeonhole-exact only below 2. */
  val AudioFpMaxHamming = 1
  require(AudioFpMaxHamming >= 0 && AudioFpMaxHamming < 2,
    s"audio band recall needs maxHamming in [0, 2), got $AudioFpMaxHamming")

  /** Per-(band, value) CLASS-population cap for the audio pair path
    * (q207) — the star-reduction guard, capped from day one like the
    * resampled image arm. */
  val AudioClassBucketCap = 8L
  require(AudioClassBucketCap >= 2,
    s"a cap below 2 leaves no room for any exact pair, got $AudioClassBucketCap")

  /** Ground-truth Jaccard threshold for the generator audit (q188/q191):
    * the definition of a "true" near-dup pair the LSH generator is
    * graded against. */
  val AuditMinJaccard = 0.5

  /** Deterministic-sample basis points + salt for q191 (shared with its
    * oracle). 40% of docs: large enough that the fixture's planted
    * near-dup pairs survive sampling with both endpoints present. */
  val AuditSampleBp = 4000
  require(0 < AuditSampleBp && AuditSampleBp < 10000,
    s"audit sample rate must be a proper fraction in bp, got $AuditSampleBp")
  val AuditSampleSalt = "audit-v1"
}
