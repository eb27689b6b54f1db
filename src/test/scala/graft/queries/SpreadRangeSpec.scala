package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Focused guards for the r20 optimization helpers: the exchange-before-
  * compute range spread, the per-path schema memo, and the streaming
  * drain's shuffle-partition restore. Each pins the PROPERTY the
  * optimization relies on, so a Spark upgrade or refactor that breaks the
  * assumption fails here, not as a silent plan regression.
  */
class SpreadRangeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfDir

  test("spreadRange partitioning satisfies a trailing orderBy - one exchange") {
    // the whole point of exchange-before-compute: orderBy on a key whose
    // PREFIX was range-partitioned plans as a local sort, not a second
    // exchange (Spark's RangePartitioning-satisfies-OrderedDistribution
    // prefix rule). If that rule ever stops holding, every spreadRange
    // call site silently gains a shuffle.
    import spark.implicits._
    val df = Tables.spreadRange(Tables.lineitem(spark, sf), $"l_orderkey")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity")
    val p = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1,
      s"expected exactly the spreadRange exchange:\n${p.take(1500)}")
  }

  test("spreadRange never splits equal keys across partitions") {
    // window partitionBy(prefix) correctness depends on this: a range
    // boundary landing INSIDE a key's run would split the key
    import spark.implicits._
    val df = Tables.spreadRange(Tables.lineitem(spark, sf), $"l_orderkey")
      .select($"l_orderkey", spark_partition_id().as("pid"))
      .groupBy($"l_orderkey")
      .agg(countDistinct($"pid").as("n_pids"))
      .filter($"n_pids" > 1)
    assert(df.isEmpty, "equal keys split across range partitions")
  }

  test("spreadRange result is a pure repartition - same rows") {
    import spark.implicits._
    val base = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    val spreadDf = Tables.spreadRange(Tables.lineitem(spark, sf),
        $"l_orderkey")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    assert(spreadDf.exceptAll(base).isEmpty && base.exceptAll(spreadDf).isEmpty,
      "spreadRange changed the multiset of rows")
  }

  test("Tables.table schema memo serves the same schema and data as a direct read") {
    val viaMemo = Tables.table(spark, sf, "nation")
    val direct = spark.read.parquet(s"$sf/nation.parquet")
    assert(viaMemo.schema == direct.schema,
      s"memoized schema diverged: ${viaMemo.schema} vs ${direct.schema}")
    assert(viaMemo.exceptAll(direct).isEmpty && direct.exceptAll(viaMemo).isEmpty,
      "memoized read returned different data")
    // distinct paths get distinct entries (keyed by full path, not name)
    val other = Tables.table(spark, "/root/testdata/sf0.01", "nation")
    assert(other.count() >= viaMemo.count())
  }

  test("drainEvents restores the session shuffle-partition setting") {
    // the streaming drains size spark.sql.shuffle.partitions to the
    // drained source bytes for the duration of the stream; a leak would
    // silently re-shape every BATCH query planned after a streaming entry
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    graft.SparkEntry.queries("ev_stream_hourly")(spark, sf).collect()
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "drainEvents leaked its shuffle-partition override")
  }
}
