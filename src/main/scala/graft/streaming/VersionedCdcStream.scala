package graft.streaming

import graft.pipeline.VersionedTable
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** The versioned table's CDC feed as a REAL Structured Streaming
  * source — what the poll-only [[VersionedCdcMirror]] cannot give:
  * watermarks, windowed aggregates, joins and stateful operators
  * compose downstream of
  * {{{
  *   spark.readStream
  *     .format("graft.streaming.VersionedCdcStreamProvider")
  *     .option("root", tableRoot)
  *     .load()
  * }}}
  * which serves every row-level change as
  * [[VersionedTable.readChangesCdc]] rows (`_change_type`
  * insert/delete, `_commit_version`).
  *
  * OFFSETS are table versions: offset v = "all changes up to and
  * including version v". `getOffset` reports the latest version, so a
  * micro-batch covers the versions committed since the last one —
  * version ranges are the natural exactly-once unit here because
  * `readChangesCdc` is DETERMINISTIC for a given range (manifest
  * diffs over immutable files): a batch re-delivered after a crash
  * (the checkpoint committed the offset but not the sink) recomputes
  * byte-identical rows, which is precisely the replayability
  * contract Structured Streaming requires of a source. The one
  * retention caveat is the feed's own: the checkpointed frontier must
  * stay inside the vacuum window ([[VersionedTable.vacuum]]'s
  * `keepVersions`), exactly like any incremental consumer.
  *
  * `option("startingVersion", v)` serves changes strictly AFTER v
  * (default 0 = the whole history). Schema is the table's current
  * schema plus the two CDC columns; add-only evolution mid-stream
  * surfaces on restart (the source re-resolves), not mid-batch.
  */
class VersionedCdcStreamProvider extends StreamSourceProvider {
  import VersionedCdcStreamProvider._

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "versioned-cdc: the schema is derived from the table; do not " +
        "supply one")
    ("versioned-cdc", cdcSchema(sqlContext.sparkSession, rootOf(parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new VersionedCdcSource(sqlContext.sparkSession, rootOf(parameters),
      parameters.get("startingVersion").map(_.toLong).getOrElse(0L))
}

object VersionedCdcStreamProvider {
  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("root", throw new IllegalArgumentException(
      "versioned-cdc needs .option(\"root\", <versioned table root>)"))

  /** The stream's schema: the table's current schema plus the CDC
    * columns — the same shape [[VersionedTable.readChangesCdc]] emits.
    */
  private[streaming] def cdcSchema(spark: SparkSession,
      root: String): StructType = {
    val v = VersionedTable.latestVersion(spark, root).getOrElse(
      sys.error(s"versioned-cdc: no versions at $root — create the " +
        "table before streaming its changes"))
    VersionedTable.readVersion(spark, root, v).schema
      .add("_change_type", StringType, nullable = false)
      .add("_commit_version", LongType, nullable = false)
  }
}

/** One table's CDC feed as a V1 [[Source]]: `getOffset` = latest
  * version, `getBatch(a, b)` = `readChangesCdc(a, b)` rebuilt as a
  * streaming DataFrame (the engine asserts `isStreaming` on it).
  */
private[streaming] class VersionedCdcSource(spark: SparkSession,
    root: String, startingVersion: Long) extends Source {

  override val schema: StructType =
    VersionedCdcStreamProvider.cdcSchema(spark, root)

  override def getOffset: Option[OffsetV1] =
    VersionedTable.latestVersion(spark, root)
      .filter(_ > startingVersion).map(v => LongOffset(v))

  override def getBatch(start: Option[OffsetV1],
      end: OffsetV1): DataFrame = {
    val fromV = start.map(version).getOrElse(startingVersion)
    val toV = version(end)
    val df = VersionedTable.readChangesCdc(spark, root, fromV, toV)
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // the batch must carry isStreaming=true — same construction as
    // Spark's own FileStreamSource
    graft.pipeline.StreamingDataFrameShim.streamingDataFrame(
      cs, df.queryExecution.toRdd, df.schema)
  }

  /** Offsets arrive live (LongOffset) or rehydrated from the
    * checkpoint log (SerializedOffset-like, json = the long).
    */
  private def version(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def stop(): Unit = ()

  override def toString: String = s"VersionedCdcSource[$root]"
}
