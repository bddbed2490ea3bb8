package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Shared 3-gram shingle table used by the near-dup and fingerprint
  * operators: distinct (doc_id[, block], shingle) rows.
  *
  * Implemented as a typed `flatMap` (plain JVM lambda) rather than the
  * `transform`/`element_at` higher-order-function column expression:
  * Spark's HOFs evaluate interpreted (no codegen), and the measured
  * difference on the fixtures is ~10× (0.8 s vs 8 s for 260k shingles).
  * The per-document `.distinct` inside the lambda also shrinks the
  * generator output before the cross-partition shuffle.
  *
  * At 100 TB a pipeline materializes this table once (it feeds several
  * downstream operators); here the operators `persist()` it so a single
  * query plan that references it multiple times computes it once.
  */
object Shingles {

  def table(docs: DataFrame, blockCol: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // no global distinct needed: each doc arrives as ONE input row and
    // shingleIter already dedupes within the doc, so (doc_id, shingle) is
    // unique by construction — saves a full shuffle.
    blockCol match {
      case Some(bc) =>
        docs.select(col("doc_id"), col(bc).cast("string"), col("text"))
          .as[(Long, String, String)]
          .flatMap { case (id, blk, text) => shingleIter(text).map(s => (id, blk, s)) }
          .toDF("doc_id", bc, "shingle")
      case None =>
        docs.select(col("doc_id"), col("text")).as[(Long, String)]
          .flatMap { case (id, text) => shingleIter(text).map(s => (id, s)) }
          .toDF("doc_id", "shingle")
    }
  }

  /** Distinct 3-token shingles of one document. The -1 limit keeps
    * trailing empty tokens, matching Spark's `split` and DuckDB's
    * `string_split` exactly. */
  private def shingleIter(text: String): Iterator[String] = {
    val t = text.split(" ", -1)
    if (t.length < 3) Iterator.empty
    else t.iterator.sliding(3).withPartial(false).map(_.mkString(" ")).distinct
  }

  /** Persist an intermediate that a single downstream plan uses more than
    * once (Spark's cache manager rewrites every matching subtree to the
    * same InMemoryRelation, so one action computes it once). */
  def shared(df: DataFrame): DataFrame = df.persist(StorageLevel.MEMORY_AND_DISK)
}
