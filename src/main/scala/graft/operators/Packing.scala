package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step that lays documents end to end into
  * fixed-size context windows for LLM training (GPT-style
  * concat-and-chunk: tokens are concatenated in a deterministic order
  * and split every `capacity` tokens; a document may span a chunk
  * boundary). An extension beyond reference parity: the reference has
  * no training-data surface, but a 100 TB pretraining pipeline ends in
  * exactly this operator.
  *
  * This computes the PLACEMENT — each document's token offset and the
  * chunk ids it spans — as pure window arithmetic, leaving the actual
  * byte-shuffling to the writer. All arithmetic is integral (`sum` of
  * longs + `div`), so placements are bit-identical under any partition
  * count or engine.
  */
object Packing {

  /** Per-document packing spans under per-group concat-and-chunk:
    * documents ordered by `idCol` within each `groupCol` stream (one
    * stream per source/shard — the unit a distributed writer owns),
    * each document starting at the running token offset of its
    * predecessors and spanning chunks `first_chunk..last_chunk` of
    * `capacity` tokens.
    *
    * Scale shape: ONE shuffle (hash on `groupCol`) + one sorted window
    * pass per group — the running sum never crosses groups, so there is
    * no global sequential dependency; 1000 executors pack 1000 sources
    * independently. The cross-group alternative (one global stream)
    * serializes the entire corpus through one partition and is exactly
    * what this shape avoids.
    *
    * Output: (groupCol, idCol, n_tokens, tok_offset, first_chunk,
    * last_chunk). `n_tokens` must be ≥ 1 per row (a whitespace
    * tokenizer emits ≥ 1 token for any string); the empty-doc guard
    * keeps `last_chunk` from underflowing `first_chunk`. */
  def packedSpans(docs: DataFrame, groupCol: String, idCol: String,
                  nTokens: Column, capacity: Int): DataFrame = {
    require(capacity > 0, "chunk capacity must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(groupCol), col(idCol), nTokens.cast("long").as("n_tokens"))
      .withColumn("tok_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("first_chunk", expr(s"tok_offset div $capacity"))
      .withColumn("last_chunk",
        expr(s"(tok_offset + n_tokens - 1) div $capacity"))
  }
}
