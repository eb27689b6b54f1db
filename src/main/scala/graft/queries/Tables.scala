package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, functions => F}

/** Table loaders + cross-engine determinism helpers.
  *
  * Every oracle-checked query must produce values that are bit-identical
  * between Spark and the DuckDB oracle. The two rules that make that true:
  *
  *   1. **Money math in decimals, not doubles.** Floating-point SUM is
  *      evaluation-order-dependent, and Spark's partition order differs from
  *      DuckDB's scan order. Casting inputs to exact DECIMAL before
  *      aggregation makes the result order-independent and identical in both
  *      engines. Averages are then derived as exact-decimal-sum → double →
  *      divide (deterministic), never as avg(double).
  *
  *   2. **Total ordering.** Every query ends with an ORDER BY whose key set
  *      makes any remaining row permutation consist only of fully identical
  *      rows.
  */
object Tables {

  // Schema memo per parquet path (metadata only, never data): without it
  // every `spark.read.parquet` call pays schema inference — a driver-side
  // footer read Spark 4 runs as a 1-task JOB — once per table REFERENCE
  // per query run (profiled r20: q5 launches six such jobs per pass,
  // ~0.2 s of its 1.1 s wall; the suite references tables ~500 times per
  // bench pass). Supplying the inferred schema back to the reader skips
  // inference while every byte of data is still read from parquet at
  // execution time. Same category as Spark's own FileStatusCache /
  // `filesourcePartitionFileCacheSize` (optimization guide §6) and the
  // existing [[graft.sources.Catalog]] same-dir view memo. The harness
  // testdata dirs are immutable within a JVM run; anything that rewrites
  // a parquet path mid-JVM must not route through this helper.
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Schema-adaptive events loader. Every downstream query (the 13 `ev_*`
    * windows, `q_window_lag_events`, the streaming suite) works on the
    * ns-long contract: `ts` = epoch nanoseconds as a raw LONG, with all
    * epoch-unit conversions done via [[fldivExpr]]. The driver's testdata
    * has shipped `ts` in two physical forms over time — nanosecond-unit
    * parquet (which Spark 4 only reads under `nanosAsLong`, yielding the
    * long directly) and native `timestamp[us]` (TIMESTAMP_NTZ in Spark) —
    * so branch on the actual parquet type and normalize to the contract:
    *
    *   - LongType (nanosAsLong path): pass through.
    *   - Timestamp/TimestampNTZ: `unix_micros(cast(ts as timestamp)) *
    *     1000L`. The session timezone is UTC in every entry point, so the
    *     NTZ→TZ cast is lossless, and µs→ns widening is exact.
    *
    * DuckDB reads the same column as µs-precision TIMESTAMP either way, so
    * the oracle side (`epoch_us`/`epoch_ms`) is unchanged. The conversion
    * is a codegen'd scalar expression on the scan output — no shuffle, no
    * UDF, and column pruning still reaches the parquet reader.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ wall-clock is DEFINED as UTC in this contract; a plain cast
        // would interpret it in the SESSION tz and shift every epoch for
        // a non-UTC caller — convert the wall from UTC to the session tz
        // first so the session-tz cast lands on the UTC instant (same
        // device as EventStreamPipeline.normalizeTs, probed non-UTC)
        raw.withColumn("ts", F.expr(
          "unix_micros(cast(convert_timezone('UTC', current_timezone(), ts) as timestamp)) * 1000L"))
      case org.apache.spark.sql.types.TimestampType =>
        // a true instant: unix_micros is timezone-independent
        raw.withColumn("ts", F.expr("unix_micros(ts) * 1000L"))
      case other =>
        // this helper exists because the physical type already drifted
        // twice; a THIRD form must fail fast, not silently mis-scale
        // (e.g. a DOUBLE of epoch seconds cast to timestamp is off 1e9)
        throw new IllegalStateException(
          s"events.parquet ts has unsupported physical type $other — " +
            "extend Tables.events with an explicit, unit-checked branch")
    }
  }

  /** Exact decimal view of a double column (see rule 1 above). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Pin an aggregated decimal and surface it as DOUBLE. The aggregation
    * itself stays exact-decimal (order-independent); only the final value is
    * cast. Emitting DECIMAL here breaks the driver's compare: pyarrow reads
    * Spark's decimal parquet as Python Decimal objects while DuckDB's
    * pandas conversion turns every DECIMAL into float64, and
    * `Decimal('44.00')` vs `44.0` hash differently even though the values
    * are equal. A correctly-rounded decimal→double cast of the same exact
    * rational yields bit-identical float64 on both engines (true while the
    * unscaled value stays under 2^53 — holds through sf0.1 at scale 6).
    * The oracle side mirrors this with CAST(... AS DOUBLE).
    */
  def asDec(c: Column, scale: Int): Column =
    c.cast(DecimalType(38, scale)).cast(org.apache.spark.sql.types.DoubleType)

  /** Integer division on longs (Spark's `/` on longs is double division,
    * which loses precision above 2^53 — fatal for epoch-nanos). `try_divide`
    * is also double; SQL `div` is the true integral division.
    */
  def ldiv(col: String, by: Long): Column = F.expr(s"$col div $by")

  /** Floor division on longs as a nestable SQL fragment. Spark's `div`
    * truncates toward zero while DuckDB's `//` and `epoch_ms`/`epoch_us`
    * floor — identical for post-epoch timestamps but off by one for
    * negative (pre-1970) values, so every epoch-unit conversion goes
    * through this (`pmod` is non-negative, making the subtraction floor).
    */
  def fldivExpr(e: String, by: Long): String =
    s"((($e) - pmod($e, ${by}L)) div ${by}L)"

  /** Floor-division column: ns→ms/µs epoch conversion (see [[fldivExpr]]). */
  def fdiv(col: String, by: Long): Column = F.expr(fldivExpr(col, by))

  /** Explicit parallelism for CPU-dense per-row stages (shingling,
    * signature building, array intersection). Small-bytes inputs inherit
    * file-layout parallelism — one small parquet file = ONE task — and
    * AQE's byte-based coalescing keeps post-shuffle stages narrow too, so
    * a stage whose per-row compute dwarfs its per-row bytes can serialize
    * an entire core-count's worth of work onto one thread (measured: the
    * whole chargram pipeline ran as 1-task stages on local[32]). Hash
    * repartitioning on the row key spreads it deterministically; AQE
    * leaves user-specified repartition counts alone.
    */
  def spread(df: DataFrame, key: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(key))

  /** Range-partitioning twin of [[spread]], for pipelines that END in a
    * global sort: placing the sort's range exchange BEFORE the CPU-dense
    * per-row work (regex, UDFs, window functions) parallelizes that work
    * without adding a shuffle — the final `orderBy` is then satisfied by
    * this partitioning (Spark's prefix rule: RangePartitioning on a key
    * prefix satisfies OrderedDistribution) and plans as a local sort or
    * disappears entirely when a window's sort already produced the order.
    * Profiled r20: the small single-row-group harness files give the scan
    * ONE effective task, and AQE's byte-based coalescing keeps small
    * post-shuffle stages at one partition too, so without an explicit
    * repartition every per-row stage of a small-bytes query serializes on
    * one core (ev_sessionize ran as three sequential 1-task stages). The
    * explicit partition count (defaultParallelism = session cores; NOT a
    * tuned constant) opts out of AQE coalescing, which optimizes bytes,
    * not CPU density. Equal keys never split across range partitions, so
    * window partitionBy(prefix) and groupBy(prefix, ...) stay correct.
    */
  def spreadRange(df: DataFrame, cols: Column*): DataFrame =
    df.repartitionByRange(
      df.sparkSession.sparkContext.defaultParallelism, cols: _*)
}
