package graft.engine

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Typed `Dataset[T]` façade over the core tables (SURVEY.md §1.4) —
  * compile-time row shapes for pipeline EDGES: tests, type-safe
  * ingestion signatures, and `KeyValueGroupedDataset` state logic
  * (`EventStream.runningUserStats` is the streaming consumer).
  *
  * Deliberately a façade, not the engine's interior: typed lambdas
  * (`ds.filter(f)`, `ds.map(f)`) are opaque to Catalyst — no predicate
  * pushdown, no column pruning, an encoder round-trip per row — so
  * operators keep the columnar `Column` DSL on the hot path and accept
  * or return `Dataset[T]` only at the boundary. */
object Typed {

  /** `value`/`props` are nullable in the fixtures → Option fields;
    * `ts` stays the raw micros LONG (see Sources.events), `ts_utc` the
    * derived timestamp. */
  final case class Event(event_id: Long, ts: Long, user_id: Long,
                         event_type: String, value: Option[Double],
                         props: Option[String], ts_utc: java.sql.Timestamp)

  final case class Document(doc_id: Long, text: String, lang: String,
                            source: String, n_chars: Long)

  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  implicit val eventEncoder: Encoder[Event] = Encoders.product[Event]
  implicit val documentEncoder: Encoder[Document] = Encoders.product[Document]
  implicit val embeddingEncoder: Encoder[Embedding] = Encoders.product[Embedding]

  def events(spark: SparkSession, sfDir: String): Dataset[Event] =
    Sources.table(spark, sfDir, "events").as[Event]

  def documents(spark: SparkSession, sfDir: String): Dataset[Document] =
    Sources.table(spark, sfDir, "documents").as[Document]

  def embeddings(spark: SparkSession, sfDir: String): Dataset[Embedding] =
    Sources.table(spark, sfDir, "embeddings").as[Embedding]
}
