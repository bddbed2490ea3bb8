package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based dedup ≡ the reference's Mongo unique-index + upsert semantics
  * (reference: src/ingest/create_indexes.py:13-23,
  * src/ingest/ingest_laps.py:57-68): re-ingesting a key keeps exactly one
  * row — the latest version.
  *
  * Scale: both operators are one shuffle on the dedup key. `latestByKey`
  * uses a row_number window partitioned BY THE KEY (never global), so it
  * parallelizes across all key groups.
  */
object Dedup {

  /** Keep the newest row per key (ties broken by `orderBy` descending) —
    * MERGE/upsert semantics as a batch operator. */
  def latestByKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Duplicate-key detection: groups with more than one row — the engine
    * analog of check_duplicates.py's $group/$match pipeline
    * (reference: src/ingest/check_duplicates.py:15-33). */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)

  /** Exact content dedup summary over a text column: total vs distinct by
    * content hash (md5). One agg pass; the hash collapses arbitrarily long
    * content to 32 bytes before the shuffle. */
  def exactDedupSummary(df: DataFrame, content: Column): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(md5(content)).as("n_distinct"),
      (count(lit(1)) - countDistinct(md5(content))).as("n_duplicates"))
}
