package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming form of the event analytics: the same hourly
  * windowed aggregation as the batch query `ev_window_hourly`
  * ([[graft.operators.EventWindows]]), expressed as an incremental stream
  * with a watermark — `readStream` → event-time window → `writeStream`.
  *
  * Scale shape: stateful windowed aggregation partitions state by
  * (window, event_type); the 1-hour watermark bounds state size, so the
  * query runs indefinitely on an unbounded stream without state growth
  * beyond the watermark horizon.
  */
object EventStreamPipeline {

  /** Schema of the events table as read with nanosAsLong (ts = epoch ns). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open the events parquet dir as a file stream. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventSchema)
      .parquet(dir)
  }

  /** Hourly tumbling-window counts + value totals with a 1-hour watermark.
    * Works on both streaming and batch DataFrames (same plan shape).
    */
  def hourlyAgg(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window($"event_time", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(18, 2))).as("total_value"))
      .select($"window.start".as("window_start"), $"event_type", $"n",
        $"total_value")
  }
}
