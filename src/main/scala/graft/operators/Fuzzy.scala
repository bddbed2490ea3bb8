package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching for vocabulary normalization — the typo/variant
  * merging step (teh→the, colour/color) that runs before token-level
  * dedup or mixture statistics.
  *
  * The scalable shape is SymSpell-style DELETION-NEIGHBORHOOD blocking:
  * every string generates itself plus its |s| delete-one variants, and
  * two strings within edit distance 1 ALWAYS share a variant
  * (substitution ⇒ both drop position i; insert/delete ⇒ the longer
  * one's deletion equals the shorter string itself), so an equi-join on
  * the variant key finds every candidate with zero cross product —
  * candidate volume is Σ bucket², bounded by variant collisions, not
  * |vocab|². The exact `levenshtein` then verifies (the blocking also
  * admits some distance-2 pairs). At 100 TB vocabulary the brute-force
  * |V|² compare is the non-starter; this is |V|·avg_len keys through
  * one shuffle. */
object Fuzzy {

  /** All unordered pairs of distinct `tokCol` values within edit
    * distance 1, via delete-one blocking + exact verify.
    * Output: (tok_a < tok_b, dist ∈ {0 is impossible after distinct, 1}). */
  def editDistanceOnePairs(tokens: DataFrame, tokCol: String): DataFrame = {
    val vocab = tokens.select(col(tokCol).as("tok")).distinct()
    // tok itself ∪ its delete-one variants; transform is a HOF
    // (CodegenFallback) but runs over the post-distinct VOCABULARY,
    // which is orders of magnitude smaller than the corpus — same
    // deliberate exception as TextFns.hitCount
    val variants = vocab.select(col("tok"), explode(array_union(
      array(col("tok")),
      transform(sequence(lit(1), length(col("tok"))), i =>
        concat(col("tok").substr(lit(1), i - lit(1)),
          col("tok").substr(i + lit(1), length(col("tok"))))))).as("variant"))
    val a = variants.select(col("tok").as("tok_a"), col("variant"))
    val b = variants.select(col("tok").as("tok_b"), col("variant"))
    a.join(b, Seq("variant"))
      .filter(col("tok_a") < col("tok_b"))
      .select(col("tok_a"), col("tok_b"))
      .distinct()
      .filter(levenshtein(col("tok_a"), col("tok_b")) <= 1)
      .withColumn("dist", levenshtein(col("tok_a"), col("tok_b")).cast("long"))
  }
}
