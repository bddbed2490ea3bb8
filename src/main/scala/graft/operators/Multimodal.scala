package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side shape is the real thing — binary column, case-class
  * schema, `mapPartitions` batch processing (one decoder init per
  * partition, not per row), partition-parallel. The decode itself is a
  * STUB (`stubDecode`): this container has no image/audio codecs, so it
  * derives deterministic fake dimensions from the payload bytes. Swapping
  * in a real codec touches only that one function.
  */
object Multimodal {

  case class Blob(doc_id: Long, payload: Array[Byte])
  case class Decoded(doc_id: Long, n_bytes: Long, width: Long, height: Long)

  /** STUB decoder — deterministic fake of an image header parse.
    * Real implementation would decode `blob.payload` here. */
  def stubDecode(blob: Blob): Decoded = {
    val n = blob.payload.length.toLong
    Decoded(blob.doc_id, n, 320 + n % 320, 240 + n % 240)
  }

  /** Attach a binary payload column (fixtures carry text; a real corpus
    * would store the media bytes directly). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Decode + feature-extract, batched per partition. */
  def decodeFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val blobs: Dataset[Blob] = withPayload(docs).as[Blob]
    blobs.mapPartitions { it =>
      // per-partition decoder init would go here (expensive codec setup
      // amortized across the partition's rows)
      it.map(stubDecode)
    }.toDF()
      .withColumn("aspect", round(col("width") / col("height"), 6))
  }
}
