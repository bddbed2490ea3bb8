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

  /** One sampled frame: index in the stream, byte offset, byte length.
    * A real decoder would add the decoded tensor / thumbnail bytes. */
  case class Frame(frame_idx: Long, offset: Long, n_bytes: Long)

  case class SampledFrames(doc_id: Long, n_frames: Long, n_sampled: Long,
                           sampled_bytes: Long, frames: Seq[Frame])

  /** Video-path plumbing: treat the payload as a fixed-`frameSize` frame
    * stream and keep every `every`-th frame — the frame-sampling stage of
    * a video pipeline, with the codec stubbed to byte-range arithmetic
    * (a real build seeks keyframes; the schema, nested frame array, and
    * per-partition batch shape are the real thing). Nested output:
    * `frames` is an ArrayType of structs, the layout a downstream
    * embed-or-caption stage consumes. */
  def sampleFrames(spark: SparkSession, docs: DataFrame,
                   frameSize: Int, every: Int): DataFrame = {
    require(frameSize > 0 && every > 0)
    import spark.implicits._
    withPayload(docs).as[Blob].mapPartitions { it =>
      it.map { b =>
        val n = b.payload.length.toLong
        val nf = (n + frameSize - 1) / frameSize
        val frames = (0L until nf by every.toLong).map { i =>
          Frame(i, i * frameSize, math.min(frameSize.toLong, n - i * frameSize))
        }
        SampledFrames(b.doc_id, nf, frames.size.toLong,
          frames.map(_.n_bytes).sum, frames)
      }
    }.toDF()
  }
}
