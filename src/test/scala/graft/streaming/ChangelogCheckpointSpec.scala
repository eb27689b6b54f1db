package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** RocksDB CHANGELOG checkpointing — the production knob for stateful
  * streaming at scale: without it every micro-batch uploads a full
  * RocksDB snapshot per state partition (checkpoint cost grows with
  * STATE size); with it each batch persists only that batch's delta and
  * snapshots are taken asynchronously in the background (cost grows with
  * the batch's CHANGES). At 1000 executors × wide state that is the
  * difference between checkpointing being free and being the batch
  * bottleneck. This spec proves the engine's pipelines run correctly
  * under the conf INCLUDING the part that actually differs — recovery:
  * a query is stopped mid-stream and restarted from the same checkpoint,
  * so the restore path must reconstruct state from snapshot + changelog
  * replay, and the final totals must equal the batch twin over the whole
  * input.
  */
class ChangelogCheckpointSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val confs = Seq(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true",
    "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false",
    "spark.sql.shuffle.partitions" -> "4")

  private def withChangelog[A](body: => A): A = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("complete-mode agg under changelog checkpointing survives a restart") {
    withChangelog {
      val srcDir = java.nio.file.Files.createTempDirectory("graft-clog-src")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-clog-ckpt")
      // first half of the events file arrives before the restart, the
      // second half after — recovery must carry the first half's state
      val all = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
      val firstHalf = java.nio.file.Files.createTempDirectory("graft-clog-a")
      val secondHalf = java.nio.file.Files.createTempDirectory("graft-clog-b")
      // split on a deterministic key: limit() has no defined row order,
      // so limit-based halves can overlap or drop rows between the two
      // independent evaluations a write + exceptAll would make
      all.where($"event_id" % 2 === 0).coalesce(1)
        .write.mode("overwrite").parquet(firstHalf.toString)
      all.where($"event_id" % 2 =!= 0).coalesce(1)
        .write.mode("overwrite").parquet(secondHalf.toString)
      def move(src: java.nio.file.Path, name: String): Unit =
        TestSpark.moveDataPart(src, srcDir, name)
      def start() = {
        val stream = EventStreamPipeline.readEvents(spark, srcDir.toString)
        stream.groupBy($"event_type")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
          .writeStream.outputMode("complete")
          .option("checkpointLocation", ckpt.toString)
          .format("memory").queryName("clog_stream")
          .start()
      }
      move(firstHalf, "batch-0")
      val q1 = start()
      try {
        q1.processAllAvailable()
        assert(spark.table("clog_stream").collect().nonEmpty)
      } finally q1.stop()

      // restart from the same checkpoint: state restores via snapshot +
      // changelog replay, then folds the second half on top
      move(secondHalf, "batch-1")
      val q2 = start()
      try {
        q2.processAllAvailable()
        val got = spark.table("clog_stream").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val want = EventStreamPipeline
          .readEventsBatch(spark, srcDir.toString)
          .groupBy($"event_type").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got == want,
          s"post-restart totals diverge from batch twin: got=$got want=$want")
        // and the run really used changelog checkpointing: delta files
        // (.changelog) exist under the state store checkpoint
        val stateDir = java.nio.file.Paths.get(ckpt.toString, "state")
        val changelogs = java.nio.file.Files.walk(stateDir).toArray
          .map(_.toString).count(_.endsWith(".changelog"))
        assert(changelogs > 0,
          "no .changelog files under the checkpoint — conf did not take")
      } finally {
        q2.stop()
        spark.catalog.dropTempView("clog_stream")
      }
    }
  }
}
