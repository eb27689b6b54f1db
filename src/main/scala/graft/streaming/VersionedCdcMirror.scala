package graft.streaming

import graft.pipeline.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The versioned table's CDC feed as an INCREMENTAL SOURCE — a
  * version-frontier poller over [[VersionedTable.readChangesCdc]]
  * driving exactly-once downstream maintenance. The frontier is NOT a
  * checkpoint file beside the data: it is the downstream table's own
  * ingest frontier, committed in the SAME atomic manifest publish as
  * the applied batch ([[VersionedTable.applyCdcBatch]]), so a poller
  * crashed between "applied" and "remembered" re-delivers the batch,
  * finds the frontier already past it, and changes nothing — the same
  * idempotence-by-construction argument as the streaming append sink,
  * now for row-level DML feeds. Two downstream shapes:
  *
  *  - [[syncMirror]]: a full row MIRROR — after every sync the mirror
  *    table equals the source table exactly (the Delta/Iceberg CDC
  *    consumer contract: applying each version's deletes and inserts
  *    in order reproduces `readVersion` at every step);
  *  - [[syncCountSum]]: a maintained per-key AGGREGATE
  *    (key, n_rows, val_sum) — the "materialized view" shape: each
  *    source version's delta (inserts minus deletes, grouped by key)
  *    merges into the aggregate, keys whose count reaches zero are
  *    deleted, all in one atomic exactly-once commit per source
  *    version.
  *
  * At 100 TB: each sync step reads ONLY the changed files of one
  * source version (manifest diffs — no change log, no table scan) and
  * rewrites only the downstream files that can hold the affected keys
  * (two-level stats pruning with sparse per-key refinement), so
  * maintenance cost tracks the CHANGE size, not the table size.
  */
object VersionedCdcMirror {

  /** The last SOURCE version this downstream table has applied (its
    * recorded ingest frontier), or 0 for a not-yet-created downstream
    * — syncing starts at frontier + 1.
    */
  def frontier(spark: SparkSession, downstreamRoot: String): Long =
    VersionedTable.latestVersion(spark, downstreamRoot)
      .map(v => VersionedTable.ingestFrontier(spark, downstreamRoot, v))
      .filter(_ >= 0).getOrElse(0L)

  /** Advance the MIRROR to the source's latest version — one atomic
    * exactly-once commit per source version. Returns the number of
    * versions actually applied (replays excluded). Safe to call at any
    * cadence from any number of pollers: the frontier arbitrates.
    */
  def syncMirror(spark: SparkSession, srcRoot: String, mirrorRoot: String,
      keyCols: Seq[String]): Int = {
    val latest = VersionedTable.latestVersion(spark, srcRoot)
      .getOrElse(return 0)
    var applied = 0
    var from = frontier(spark, mirrorRoot)
    while (from < latest) {
      val v = from + 1
      val changes = VersionedTable.readChangesCdc(spark, srcRoot, v - 1, v)
      val data = changes.columns
        .filterNot(c => c == "_change_type" || c == "_commit_version")
        .map(col).toSeq
      val inserts = changes.filter(col("_change_type") === "insert")
        .select(data: _*)
      val deleteKeys = changes.filter(col("_change_type") === "delete")
        .select(keyCols.map(col): _*).distinct()
      val (_, didApply) = VersionedTable.applyCdcBatch(spark, mirrorRoot,
        inserts, deleteKeys, keyCols, v)
      if (didApply) applied += 1
      from = v
    }
    applied
  }

  /** Advance a maintained per-key AGGREGATE (key, n_rows, val_sum of
    * `valCol`) to the source's latest version — one atomic
    * exactly-once commit per source version. The delta of version v
    * (inserts +1/+val, deletes -1/-val, grouped by key) merges into
    * the current aggregate; keys reaching zero rows are deleted.
    * Deterministic replay: the delta is a pure function of the
    * source's immutable manifests, and the commit is frontier-gated.
    */
  def syncCountSum(spark: SparkSession, srcRoot: String, aggRoot: String,
      keyCol: String, valCol: String): Int = {
    val latest = VersionedTable.latestVersion(spark, srcRoot)
      .getOrElse(return 0)
    var applied = 0
    var from = frontier(spark, aggRoot)
    while (from < latest) {
      val v = from + 1
      val changes = VersionedTable.readChangesCdc(spark, srcRoot, v - 1, v)
      val delta = changes
        .withColumn("_sign",
          when(col("_change_type") === "insert", 1L).otherwise(-1L))
        .groupBy(col(keyCol))
        .agg(sum(col("_sign")).as("d_rows"),
          sum(col("_sign") * col(valCol)).as("d_sum"))
      val current =
        if (VersionedTable.latestVersion(spark, aggRoot).isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField(keyCol,
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("n_rows",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("val_sum",
                org.apache.spark.sql.types.LongType))))
        else VersionedTable.read(spark, aggRoot)
      // merge the delta into the affected keys' current rows; the
      // join stays small — delta keys only
      val mergedRows = current.join(delta, Seq(keyCol), "right_outer")
        .select(col(keyCol),
          (coalesce(col("n_rows"), lit(0L)) + col("d_rows")).as("n_rows"),
          (coalesce(col("val_sum"), lit(0L)) + col("d_sum")).as("val_sum"))
      val upserts = mergedRows.filter(col("n_rows") > 0L)
      val deleteKeys = mergedRows.filter(col("n_rows") <= 0L)
        .select(col(keyCol))
      val (_, didApply) = VersionedTable.applyCdcBatch(spark, aggRoot,
        upserts, deleteKeys, Seq(keyCol), v)
      if (didApply) applied += 1
      from = v
    }
    applied
  }
}
