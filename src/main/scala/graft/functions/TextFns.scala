package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline operators.
  * Everything composes built-in Catalyst expressions — no UDFs — and the
  * same logic is expressible 1:1 in the DuckDB oracle SQL. One honest
  * exception to "whole-stage codegen throughout": [[hitCount]]'s
  * higher-order `filter` evaluates interpreted (HOFs are
  * CodegenFallback). It is kept deliberately: it does ONE pass over the
  * token array with a multiset-preserving membership test, where the
  * codegen'd alternatives either change semantics (array_intersect
  * dedups) or scan the array once per stopword (|set| ≈ 20–40 passes);
  * measured cost is ~0.4 s over 5000 docs × 4 languages at sf0.1 —
  * off the hot path the header rule protects.
  */
object TextFns {

  /** Whitespace tokenization (fixtures are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Count of tokens belonging to `set` (stopword hits etc.) —
    * multiplicity-preserving, single array pass (see file header for
    * the codegen trade-off). */
  def hitCount(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isin(set.map(x => x: Any): _*))).cast("long")
}
