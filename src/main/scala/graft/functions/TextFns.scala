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

  /** Count of tokens belonging to `set` (stopword hits etc.). */
  def hitCount(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isin(set.map(x => x: Any): _*))).cast("long")
}
