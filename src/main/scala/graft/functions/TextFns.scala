package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline operators.
  * Everything here composes built-in codegen'd Catalyst expressions — no
  * UDFs — so whole-stage codegen stays unbroken on the 100 TB hot path,
  * and the same logic is expressible 1:1 in the DuckDB oracle SQL.
  */
object TextFns {

  /** Whitespace tokenization (fixtures are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** 3-gram token shingles: ["a b c", "b c d", ...]; empty if < 3 tokens.
    * Built with transform+sequence (codegen'd higher-order functions). */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** Seeded content hash: md5("<seed>|<s>") — a cheap family of
    * "permutations" for MinHash; lexicographic min over hex strings is a
    * valid uniform min-hash and is engine-portable (identical in any md5
    * implementation). */
  def seededHash(seed: Int, s: Column): Column =
    md5(concat(lit(s"$seed|"), s))

  /** Value 0-15 of the j-th (1-based) hex digit of a lowercase hex string. */
  def hexNibble(hex: Column, j: Int): Column =
    (instr(lit("0123456789abcdef"), substring(hex, j, 1).cast("string")) - 1)
      .cast("int")

  /** Count of tokens belonging to `set` (stopword hits etc.). */
  def hitCount(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isin(set.map(x => x: Any): _*))).cast("long")
}
