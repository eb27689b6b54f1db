package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The streaming pipeline must produce the same totals as its batch twin
  * when fed the complete input (memory sink + processAllAvailable drives
  * the file stream synchronously).
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming hourly agg equals batch hourly agg on the full input") {
    // file streams want a directory of arriving files, not a single file
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val dir = streamDir.toString
    val stream = EventStreamPipeline.readEvents(spark, dir)
    val q = EventStreamPipeline.hourlyAgg(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly_stream")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_stream")
        .select($"window_start", $"event_type", $"n", $"total_value")
        .collect().map(_.toSeq).toSet

      val batch = EventStreamPipeline.hourlyAgg(
        spark.read.parquet(dir).where($"ts".isNotNull))
        .collect().map(_.toSeq).toSet

      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
