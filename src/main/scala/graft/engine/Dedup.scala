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

  /** Snapshot reconciliation: per-key diff of two versions of a keyed
    * table — the regression gate of a data pipeline ("what changed
    * between yesterday's corpus and today's?"). Each side collapses to
    * (key, row-hash) BEFORE the full-outer join, so the exchange ships
    * 32-byte digests instead of full rows regardless of row width. The
    * row hash is md5 of the canonical JSON of all non-key columns in
    * sorted column order (type- and null-faithful, column-order
    * insensitive). Top-level MAP columns are canonicalized to key-sorted
    * entry arrays before hashing — map iteration order is not stable
    * across physical builds, and raw to_json would report spurious
    * 'changed' rows (maps nested deeper inside structs are NOT
    * canonicalized; restructure those first). Keys must be unique per
    * side (snapshot semantics — apply [[latestByKey]] first if not).
    * Output: key columns + `status` ∈ added | removed | changed |
    * unchanged. */
  def tableDiff(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "tableDiff needs at least one key column")
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"schemas differ: ${a.columns.sorted.mkString(",")} vs " +
        s"${b.columns.sorted.mkString(",")}")
    val nonKey = a.columns.filterNot(keys.contains).sorted
    def canonical(df: DataFrame)(c: String): Column = df.schema(c).dataType match {
      case _: org.apache.spark.sql.types.MapType =>
        array_sort(map_entries(col(c))).as(c)
      case _ => col(c)
    }
    def hashed(df: DataFrame, hname: String) = df.select(
      keys.map(col) :+
        md5(to_json(struct(nonKey.map(canonical(df)): _*))).as(hname): _*)
    hashed(a, "__h_a").join(hashed(b, "__h_b"), keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__h_b").isNull, lit("removed"))
          .when(col("__h_a").isNull, lit("added"))
          .when(col("__h_a") =!= col("__h_b"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"): _*)
  }

  /** Golden-record survivorship: collapse all rows of a key into ONE
    * record where each attribute independently keeps its latest NON-NULL
    * value — the master-data merge policy [[latestByKey]] cannot express
    * (keep-1 drops an older row even when it holds the only non-null
    * phone number).
    *
    * Per attribute: `max(struct(order, tie, attr))` over rows where the
    * attribute is non-null — struct comparison is lexicographic, so the
    * max is the attr at the latest (order, tie); rows where it is null
    * contribute nothing. One hash aggregate, fully mergeable partials
    * (each partial is one struct per attribute), O(groups) shuffle —
    * no window sort, unlike keep-1. `tieCol` must make (order, tie)
    * unique per key so the comparison never reaches the attr field.
    * Output: keys, each attr (latest non-null), `last_seen` (max order
    * over ALL rows), `n_rows`. */
  def goldenRecord(df: DataFrame, keys: Seq[String], orderCol: String,
                   tieCol: String, attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "goldenRecord needs at least one attribute")
    val picks = attrs.map { a =>
      max(when(col(a).isNotNull,
        struct(col(orderCol), col(tieCol), col(a))))
        .getField(a).as(a)
    }
    df.groupBy(keys.map(col): _*)
      .agg(picks.head,
        (picks.tail :+ max(col(orderCol)).as("last_seen")
          :+ count(lit(1)).as("n_rows")): _*)
  }
}
