package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.engine.Sources

/** Structured Streaming surface over the event table — the upgrade path
  * from the reference's *simulated* velocity (idempotent batch re-ingest,
  * SURVEY.md §2.9) to a true incremental pipeline.
  *
  * `readStream` → event-time tumbling window agg → sink. On a cluster this
  * runs continuously against arriving files/Kafka with a watermark
  * bounding state; here the fixture parquet drives one synchronous batch
  * through the identical plan, which makes the result deterministic and
  * oracle-checkable against the batch equivalent.
  */
object EventStream {

  /** Streaming source over the events fixture (schema pinned; nanos ts
    * read as long, micros ts derived — same convention as Sources). */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // FileStreamSource needs a directory basePath; a glob that matches the
    // single fixture file keeps the parent dir as the base.
    spark.readStream
      .schema(Sources.events)
      .parquet(s"$sfDir/events.parque[t]")
      .withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
  }

  /** Hourly tumbling-window counts/averages per event type, with an
    * event-time watermark (bounds state on an unbounded stream; a closed
    * window's state is dropped once the watermark passes it). */
  def hourlyAgg(stream: DataFrame, withWatermark: Boolean): DataFrame = {
    val src = if (withWatermark) stream.withWatermark("ts_utc", "2 hours") else stream
    src.groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), avg(col("value")).as("avg_value"))
  }

  /** Run the streaming aggregation to completion over the fixture batch
    * and return the final result as a batch DataFrame. */
  def runHourlyOnce(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "hourly_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = hourlyAgg(readEvents(spark, sfDir), withWatermark = false)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), round(col("avg_value"), 6).as("avg_value"))
      .orderBy(col("hour_start").asc, col("event_type").asc)
  }
}
