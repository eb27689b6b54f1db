package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The inherited relational surface (SURVEY §2b), exercised TPC-H-style over
  * the driver's tables — scans, filters, projections, hash/broadcast joins,
  * semi/anti joins, aggregations (plain, distinct, rollup, cube), windows,
  * sort/limit/top-k, set ops, scalar function library, subqueries. Each
  * query is declarative DataFrame code (Catalyst plans it; filters and
  * column pruning reach the parquet scan) paired with a DuckDB oracle that
  * must hash-match (see [[Tables]] for the cross-engine determinism rules).
  */
/** Typed-Dataset row for the q_typed_pipeline query. */
case class LineSlim(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

object RelationalQueries {

  case class Q(
      name: String,
      build: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  import Tables._

  private val q1 = Q(
    "q1_pricing_summary",
    (s, d) => {
      import s.implicits._
      // spread before the aggregation: the harness lineitem file is a
      // single parquet row group, so the scan (and with it the whole
      // partial aggregate — profiled 1.05 s of the 1.3 s wall) runs as
      // ONE task; hash-distributing on the high-cardinality order key
      // parallelizes the decimal sums across the session's cores (guide
      // §2.5 "input skew: one huge unsplittable file — repartition
      // immediately after the read"). Filter + pruning still push below
      // the exchange into the scan.
      spread(lineitem(s, d)
        .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02"))), "l_orderkey")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          asDec(sum(dec2($"l_quantity")), 2).as("sum_qty"),
          asDec(sum(dec2($"l_extendedprice")), 2).as("sum_base_price"),
          asDec(sum((dec2($"l_extendedprice") * (lit(1) - dec2($"l_discount")))
            .cast(DecimalType(18, 4))), 4).as("sum_disc_price"),
          asDec(sum(((dec2($"l_extendedprice") * (lit(1) - dec2($"l_discount")))
            .cast(DecimalType(18, 4)) * (lit(1) + dec2($"l_tax")))
            .cast(DecimalType(18, 6))), 6).as("sum_charge"),
          (sum(dec2($"l_quantity")).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  private val q3 = Q(
    "q3_shipping_priority",
    (s, d) => {
      import s.implicits._
      val cut = to_timestamp(lit("1998-01-01"))
      customer(s, d).filter($"c_mktsegment" === "BUILDING")
        .join(orders(s, d), $"c_custkey" === $"o_custkey")
        .filter($"o_orderdate" < cut)
        .join(lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .filter($"l_shipdate" > cut)
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(asDec(sum((dec2($"l_extendedprice") * (lit(1) - dec2($"l_discount")))
          .cast(DecimalType(18, 4))), 4).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },
    Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
      CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  private val q5 = Q(
    "q5_local_supplier_volume",
    (s, d) => {
      import s.implicits._
      val cust = customer(s, d)
      val supp = supplier(s, d)
      lineitem(s, d)
        .join(orders(s, d), $"l_orderkey" === $"o_orderkey")
        .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01")) &&
          $"o_orderdate" < to_timestamp(lit("1997-01-01")))
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(supp, $"l_suppkey" === $"s_suppkey" &&
          $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(region(s, d)), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "ASIA")
        .groupBy($"n_name")
        .agg(asDec(sum((dec2($"l_extendedprice") * (lit(1) - dec2($"l_discount")))
          .cast(DecimalType(18, 4))), 4).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },
    Some("""SELECT n_name,
      CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  private val q6 = Q(
    "q6_forecast_revenue",
    (s, d) => {
      import s.implicits._
      lineitem(s, d)
        .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01")) &&
          $"l_shipdate" < to_timestamp(lit("1997-01-01")) &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
        .agg(asDec(sum((dec2($"l_extendedprice") * dec2($"l_discount"))
          .cast(DecimalType(18, 4))), 4).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT
      CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      count(*) AS n_items
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"""))

  private val qSemi = Q(
    "q_semi_join",
    (s, d) => {
      import s.implicits._
      val o96 = orders(s, d)
        .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01")) &&
          $"o_orderdate" < to_timestamp(lit("1997-01-01")))
      customer(s, d).filter($"c_mktsegment" === "MACHINERY")
        .join(o96, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE c_mktsegment = 'MACHINERY' AND EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
      ORDER BY c_custkey"""))

  private val qAnti = Q(
    "q_anti_join",
    (s, d) => {
      import s.implicits._
      customer(s, d)
        .join(orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_acctbal")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_acctbal FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  private val qOuter = Q(
    "q_outer_join_counts",
    (s, d) => {
      import s.implicits._
      customer(s, d)
        .join(orders(s, d), $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"),
          asDec(sum(coalesce(dec2($"o_totalprice"), lit(0))), 2).as("total_spent"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
      CAST(sum(coalesce(CAST(o_totalprice AS DECIMAL(18,2)), 0)) AS DOUBLE) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey"""))

  private val qWindowTopN = Q(
    "q_window_topn",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      customer(s, d)
        .join(orders(s, d), $"c_custkey" === $"o_custkey")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"c_mktsegment", $"rn", $"o_orderkey", $"o_totalprice")
        .orderBy($"c_mktsegment", $"rn")
    },
    Some("""SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM customer JOIN orders ON c_custkey = o_custkey) t
      WHERE rn <= 3 ORDER BY c_mktsegment, rn"""))

  private val qWindowRunning = Q(
    "q_window_running_sum",
    (s, d) => {
      import s.implicits._
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
      // the full composite below is, making the running sum deterministic.
      val w = Window.partitionBy($"l_orderkey")
        .orderBy($"l_linenumber", $"l_partkey", $"l_suppkey", $"l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // One exchange instead of two (guide §2.4): range-partitioning on
      // l_orderkey up front satisfies BOTH the window's clustering
      // (equal keys never split across range partitions) AND the final
      // global sort (RangePartitioning on a key prefix satisfies
      // OrderedDistribution), and the window's partition sort already
      // produces the full output order — so the hash exchange + second
      // range exchange + final sort of the naive plan all disappear.
      // Before: Exchange hash(l_orderkey) → Sort+Window → Exchange
      // range(5 cols) → Sort. After: Exchange range(l_orderkey) →
      // Sort+Window.
      spreadRange(lineitem(s, d), $"l_orderkey")
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
          $"l_quantity",
          asDec(sum(dec2($"l_quantity")).over(w), 2).as("running_qty"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
          $"l_quantity")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
           OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity"""))

  private val qWindowLag = Q(
    "q_window_lag_events",
    (s, d) => {
      import s.implicits._
      val ev = events(s, d)
        .select($"event_id", $"user_id", fdiv("ts", 1000000L).as("ts_ms"))
      val w = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
      ev.select($"event_id", $"user_id",
          ($"ts_ms" - lag($"ts_ms", 1).over(w)).as("ms_since_prev"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, user_id,
      epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS ms_since_prev
      FROM events ORDER BY event_id"""))

  private val qRollup = Q(
    "q_rollup",
    (s, d) => {
      import s.implicits._
      // spread before Expand (rollup = x3 row multiplier inside the
      // 1-task scan otherwise; q1/q_distinct_agg story)
      spread(lineitem(s, d), "l_orderkey")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          asDec(sum(dec2($"l_quantity")), 2).as("sum_qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  private val qCube = Q(
    "q_cube",
    (s, d) => {
      import s.implicits._
      orders(s, d)
        .cube($"o_orderpriority", $"o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .orderBy($"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
    },
    Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n
      FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
      ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST"""))

  private val qSetOps = Q(
    "q_set_ops",
    (s, d) => {
      import s.implicits._
      def custkeysIn(year: Int): DataFrame =
        orders(s, d)
          .filter($"o_orderdate" >= to_timestamp(lit(f"$year-01-01")) &&
            $"o_orderdate" < to_timestamp(lit(f"${year + 1}-01-01")))
          .select($"o_custkey").distinct()
      custkeysIn(1995).intersect(custkeysIn(1996))
        .union(custkeysIn(1997)).distinct()
        .except(custkeysIn(1998))
        .orderBy($"o_custkey")
    },
    Some("""WITH y AS (SELECT DISTINCT o_custkey, year(o_orderdate) AS yr FROM orders)
      (SELECT o_custkey FROM y WHERE yr = 1995
       INTERSECT SELECT o_custkey FROM y WHERE yr = 1996
       UNION SELECT o_custkey FROM y WHERE yr = 1997)
      EXCEPT SELECT o_custkey FROM y WHERE yr = 1998
      ORDER BY o_custkey"""))

  private val qDistinctAgg = Q(
    "q_distinct_agg",
    (s, d) => {
      import s.implicits._
      // spread before the multi-distinct aggregate: Catalyst plans three
      // COUNT(DISTINCT ...) as an Expand (×4 row multiplier) feeding the
      // first-level dedup aggregate, all INSIDE the scan stage — which is
      // one task on the single-row-group harness file (profiled: 1.49 s
      // serial of the 2.3 s wall). Distributing on the order key first
      // runs Expand + partial dedup on all cores (guide §2.5).
      spread(lineitem(s, d), "l_orderkey")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_orderkey").as("n_orders"),
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey", $"l_partkey").as("n_supp_part"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
      count(DISTINCT l_orderkey) AS n_orders,
      count(DISTINCT l_partkey) AS n_parts,
      count(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part,
      count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private val qTopK = Q(
    "q_topk_orders",
    (s, d) => {
      import s.implicits._
      orders(s, d)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(20)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""))

  private val qScalarFuncs = Q(
    "q_scalar_funcs",
    (s, d) => {
      import s.implicits._
      part(s, d).select(
        $"p_partkey",
        upper(substring($"p_name", 1, 10)).as("name_prefix"),
        length($"p_name").cast(LongType).as("name_len"),
        concat($"p_brand", lit("#"), $"p_type").as("brand_type"),
        abs($"p_size" - 25).cast(LongType).as("size_dist"),
        floor($"p_retailprice").as("price_floor"),
        ceil($"p_retailprice").as("price_ceil"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
      upper(substr(p_name, 1, 10)) AS name_prefix,
      CAST(length(p_name) AS BIGINT) AS name_len,
      concat(p_brand, '#', p_type) AS brand_type,
      CAST(abs(p_size - 25) AS BIGINT) AS size_dist,
      CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
      CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil
      FROM part ORDER BY p_partkey"""))

  private val qDateFuncs = Q(
    "q_date_funcs",
    (s, d) => {
      import s.implicits._
      orders(s, d)
        .select(year($"o_orderdate").cast(LongType).as("yr"),
          month($"o_orderdate").cast(LongType).as("mo"))
        .groupBy($"yr", $"mo")
        .agg(count(lit(1)).as("n"))
        .orderBy($"yr", $"mo")
    },
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      CAST(month(o_orderdate) AS BIGINT) AS mo, count(*) AS n
      FROM orders GROUP BY yr, mo ORDER BY yr, mo"""))

  private val qCaseWhen = Q(
    "q_case_buckets",
    (s, d) => {
      import s.implicits._
      orders(s, d)
        .select(when($"o_totalprice" < 50000, "low")
          .when($"o_totalprice" < 150000, "mid")
          .otherwise("high").as("bucket"))
        .groupBy($"bucket").agg(count(lit(1)).as("n"))
        .orderBy($"bucket")
    },
    Some("""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                        WHEN o_totalprice < 150000 THEN 'mid'
                        ELSE 'high' END AS bucket, count(*) AS n
      FROM orders GROUP BY 1 ORDER BY bucket"""))

  private val qHaving = Q(
    "q_having",
    (s, d) => {
      import s.implicits._
      orders(s, d)
        .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
        .filter($"n_orders" >= 15)
        .orderBy($"o_custkey")
    },
    Some("""SELECT o_custkey, count(*) AS n_orders FROM orders
      GROUP BY o_custkey HAVING count(*) >= 15 ORDER BY o_custkey"""))

  private val qScalarSubquery = Q(
    "q_scalar_subquery",
    (s, d) => {
      import s.implicits._
      val o = orders(s, d)
      val maxPrice = o.agg(max($"o_totalprice")).first().getDouble(0)
      o.filter($"o_totalprice" > maxPrice * 0.95)
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.95
      ORDER BY o_orderkey"""))

  private val qExistsCorr = Q(
    "q_exists_correlated",
    (s, d) => {
      import s.implicits._
      val heavy = lineitem(s, d).filter($"l_quantity" >= 49)
      part(s, d)
        .join(heavy, $"p_partkey" === $"l_partkey", "left_semi")
        .select($"p_partkey", $"p_name")
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey, p_name FROM part
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 49)
      ORDER BY p_partkey"""))

  private val qDimJoin = Q(
    "q_region_volume",
    (s, d) => {
      import s.implicits._
      lineitem(s, d)
        .join(supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_items"),
          asDec(sum(dec2($"l_extendedprice")), 2).as("volume"))
        .orderBy($"r_name")
    },
    Some("""SELECT r_name, count(*) AS n_items,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  private val qPivot = Q(
    "q_pivot_events",
    (s, d) => {
      import s.implicits._
      events(s, d)
        .groupBy($"user_id")
        .agg(
          count(when($"event_type" === "click", 1)).as("n_click"),
          count(when($"event_type" === "view", 1)).as("n_view"),
          count(when($"event_type" === "purchase", 1)).as("n_purchase"),
          count(when($"event_type" === "error", 1)).as("n_error"),
          count(when($"event_type" === "signup", 1)).as("n_signup"),
          asDec(sum(dec2($"value")), 2).as("total_value"))
        .orderBy($"user_id")
    },
    Some("""SELECT user_id,
      count(*) FILTER (WHERE event_type = 'click') AS n_click,
      count(*) FILTER (WHERE event_type = 'view') AS n_view,
      count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      count(*) FILTER (WHERE event_type = 'error') AS n_error,
      count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY user_id ORDER BY user_id"""))

  private val qRegexp = Q(
    "q_regexp_json",
    (s, d) => {
      import s.implicits._
      events(s, d)
        .select(regexp_extract($"props", "\"k\": (\\d+)", 1)
          .cast(LongType).as("k"))
        .groupBy($"k").agg(count(lit(1)).as("n"))
        .orderBy($"k")
    },
    Some("""SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
      count(*) AS n FROM events GROUP BY k ORDER BY k"""))

  /** Semi-structured JSON through Spark 4's VARIANT type: `parse_json`
    * once, then typed path extraction (`variant_get`) — the
    * schema-on-read path for event properties that beats per-field regex
    * or repeated from_json at scale (one parse, binary-encoded access).
    * The DuckDB oracle uses its native JSON extraction; both engines
    * reduce to the same typed values.
    */
  private val qVariant = Q(
    "q_json_variant",
    (s, d) => {
      import s.implicits._
      events(s, d)
        .select(expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
          $"event_type")
        .groupBy($"k")
        .agg(count(lit(1)).as("n"),
          countDistinct($"event_type").as("n_types"))
        .orderBy($"k")
    },
    Some("""SELECT CAST(props->>'k' AS BIGINT) AS k, count(*) AS n,
        count(DISTINCT event_type) AS n_types
      FROM events GROUP BY k ORDER BY k"""))

  private val qMinMax = Q(
    "q_minmax_stats",
    (s, d) => {
      import s.implicits._
      lineitem(s, d)
        .groupBy($"l_linestatus")
        .agg(min($"l_quantity").as("min_qty"),
          max($"l_quantity").as("max_qty"),
          min($"l_shipdate").as("first_ship"),
          max($"l_shipdate").as("last_ship"),
          min($"l_orderkey").as("min_key"),
          max($"l_orderkey").as("max_key"))
        .orderBy($"l_linestatus")
    },
    Some("""SELECT l_linestatus, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
      min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  private val qGroupingSets = Q(
    "q_grouping_sets",
    (s, d) => {
      // explicit GROUPING SETS is SQL-only surface; still Spark SQL planning
      lineitem(s, d).createOrReplaceTempView("graft_lineitem_gs")
      s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM graft_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    },
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  private val qPercentiles = Q(
    "q_percentiles",
    (s, d) => {
      import s.implicits._
      // spread before the sort-buffer percentile partials (1-task scan)
      spread(lineitem(s, d), "l_orderkey")
        .groupBy($"l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("qty_p50"),
          expr("percentile(l_quantity, 0.9)").as("qty_p90"),
          expr("percentile(l_extendedprice, 0.5)").as("price_p50"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
      quantile_cont(l_quantity, 0.5) AS qty_p50,
      quantile_cont(l_quantity, 0.9) AS qty_p90,
      quantile_cont(l_extendedprice, 0.5) AS price_p50
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private val qWindowMisc = Q(
    "q_window_misc",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      orders(s, d)
        .filter($"o_orderkey" < 2000)
        .select($"o_orderpriority", $"o_orderkey", $"o_totalprice",
          rank().over(w).cast(LongType).as("rnk"),
          dense_rank().over(w).cast(LongType).as("drnk"),
          ntile(4).over(w).cast(LongType).as("quartile"),
          lead($"o_orderkey", 1).over(w).as("next_key"),
          first_value($"o_orderkey").over(w).as("top_key"))
        .orderBy($"o_orderpriority", $"rnk", $"o_orderkey")
    },
    Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
      CAST(rank() OVER w AS BIGINT) AS rnk,
      CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      lead(o_orderkey, 1) OVER w AS next_key,
      first_value(o_orderkey) OVER w AS top_key
      FROM orders WHERE o_orderkey < 2000
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderpriority, rnk, o_orderkey"""))

  /** Window frame coverage beyond [[qWindowMisc]]: a RANGE frame (value-
    * based — peers are *price neighborhoods*, not row offsets), nth_value
    * and percent_rank/cume_dist over a deterministic total order, and a
    * tail frame (CURRENT ROW → UNBOUNDED FOLLOWING). The range-frame sum
    * stays exact-decimal (order-free inside the frame); percent_rank and
    * cume_dist are exact integer ratios, correctly rounded identically on
    * both engines. One shuffle on the partition key serves all three
    * window specs — same key, Catalyst reuses the partitioning.
    */
  private val qWindowFrames = Q(
    "q_window_frames",
    (s, d) => {
      import s.implicits._
      val wOrd = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      val wRange = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice")
        .rangeBetween(-1000L, 0L)
      val wTail = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      orders(s, d)
        .filter($"o_orderkey" < 2000)
        .select($"o_orderpriority", $"o_orderkey", $"o_totalprice",
          count(lit(1)).over(wRange).as("n_within_1k"),
          asDec(sum(dec2($"o_totalprice")).over(wRange), 2).as("sum_within_1k"),
          nth_value($"o_orderkey", 2).over(wOrd).as("second_key"),
          percent_rank().over(wOrd).as("pct_rank"),
          cume_dist().over(wOrd).as("cume"),
          last($"o_orderkey").over(wTail).as("last_key"))
        .orderBy($"o_orderpriority", $"o_totalprice".desc, $"o_orderkey")
    },
    Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
      count(*) OVER wr AS n_within_1k,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER wr AS DOUBLE) AS sum_within_1k,
      nth_value(o_orderkey, 2) OVER wo AS second_key,
      percent_rank() OVER wo AS pct_rank,
      cume_dist() OVER wo AS cume,
      last_value(o_orderkey) OVER wt AS last_key
      FROM orders WHERE o_orderkey < 2000
      WINDOW wo AS (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey),
             wr AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
                    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW),
             wt AS (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey"""))

  /** Calendar-interval RANGE frame — the trailing-30-day per-customer
    * spend, the time-windowed aggregate shape batch analytics shares with
    * the streaming sliding window. The frame bound is an INTERVAL over the
    * timestamp ORDER BY column (inexpressible through the long-offset
    * `rangeBetween` API, hence SQL); peers at the same date share one
    * value-defined frame, so ties cannot make the result order-dependent,
    * and the in-frame sum stays exact-decimal. One shuffle on o_custkey.
    */
  private val qWindowTimeRange = Q(
    "q_window_time_range",
    (s, d) => {
      orders(s, d).createOrReplaceTempView("graft_orders_wtr")
      s.sql("""SELECT o_custkey, o_orderkey, o_orderdate,
        count(*) OVER w AS n_30d,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_30d
        FROM graft_orders_wtr WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderdate, o_orderkey""")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
      count(*) OVER w AS n_30d,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_30d
      FROM orders WHERE o_custkey < 200
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  private val qScalarFuncs2 = Q(
    "q_scalar_funcs2",
    (s, d) => {
      import s.implicits._
      part(s, d).select(
        $"p_partkey",
        lpad($"p_brand", 12, "_").as("brand_pad"),
        regexp_replace($"p_name", " ", "-").as("name_dashed"),
        reverse($"p_type").as("type_rev"),
        greatest($"p_size", lit(10)).cast(LongType).as("size_floor10"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
      lpad(p_brand, 12, '_') AS brand_pad,
      replace(p_name, ' ', '-') AS name_dashed,
      reverse(p_type) AS type_rev,
      CAST(greatest(p_size, 10) AS BIGINT) AS size_floor10
      FROM part ORDER BY p_partkey"""))

  private val qDateArith = Q(
    "q_date_arith",
    (s, d) => {
      import s.implicits._
      lineitem(s, d)
        .join(orders(s, d), $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
          datediff($"l_shipdate", $"o_orderdate").cast(LongType).as("ship_lag_days"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
          $"ship_lag_days")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      date_diff('day', o_orderdate, l_shipdate) AS ship_lag_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, ship_lag_days"""))

  private val qArrayAgg = Q(
    "q_array_agg",
    (s, d) => {
      import s.implicits._
      // array aggregation + string aggregation with pinned element order.
      // The array is built (collect_list + sort_array) but surfaced as CSV
      // and as scalar first/last elements: the driver's pandas compare
      // cannot sort/hash array-typed cells (unhashable numpy.ndarray), so
      // outputs must be scalar columns.
      val arr = sort_array(collect_list($"n_name"))
      nation(s, d)
        .groupBy($"n_regionkey")
        .agg(concat_ws(",", arr).as("nation_csv"),
          element_at(arr, 1).as("first_nation"),
          element_at(arr, -1).as("last_nation"),
          size(arr).cast(LongType).as("n"))
        .orderBy($"n_regionkey")
    },
    Some("""SELECT n_regionkey,
      string_agg(n_name, ',' ORDER BY n_name) AS nation_csv,
      min(n_name) AS first_nation,
      max(n_name) AS last_nation,
      count(*) AS n
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  private val qTypedPipeline = Q(
    "q_typed_pipeline",
    (s, d) => {
      import s.implicits._
      // typed Dataset surface: case-class Encoder, lambda filter, groupByKey
      val ds = lineitem(s, d)
        .select($"l_orderkey", $"l_quantity", $"l_returnflag").as[LineSlim]
      ds.filter(_.l_quantity > 30.0)
        .groupByKey(_.l_returnflag)
        .count()
        .toDF("l_returnflag", "n")
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n FROM lineitem
      WHERE l_quantity > 30.0 GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private val qSetOpsAll = Q(
    "q_set_ops_all",
    (s, d) => {
      import s.implicits._
      // multiset (ALL) variants: keep duplicates through the set operation
      val flags95 = lineitem(s, d)
        .filter($"l_shipdate" < to_timestamp(lit("1997-01-01")))
        .select($"l_returnflag")
      val flags96 = lineitem(s, d)
        .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01")))
        .select($"l_returnflag")
      flags95.intersectAll(flags96)
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n_intersect_all"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n_intersect_all FROM (
        SELECT l_returnflag FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
        INTERSECT ALL
        SELECT l_returnflag FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01')
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private val qJoinRange = Q(
    "q_join_range",
    (s, d) => {
      import s.implicits._
      // equi-join on the key plus a residual range predicate (shipped
      // within 90 days of ordering): the mixed-condition join shape —
      // shuffle on the equi key, range evaluated inside the joined stream
      lineitem(s, d)
        .join(orders(s, d), $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" &&
          $"l_shipdate" <= date_add($"o_orderdate".cast(DateType), 90)
            .cast(TimestampType))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_shipped_90d"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_shipped_90d
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        AND l_shipdate >= o_orderdate
        AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  private val qTopKAgg = Q(
    "q_topk_agg",
    (s, d) => {
      import graft.functions.TopKAggregator.top_k
      import s.implicits._
      // top-k surfaced as rank columns, not an array (see q_array_agg on
      // why the driver compare needs scalar cells)
      spread(lineitem(s, d), "l_orderkey")
        .groupBy($"l_returnflag")
        .agg(top_k(3)($"l_extendedprice").as("top3"))
        .select($"l_returnflag",
          element_at($"top3", 1).as("price_1"),
          element_at($"top3", 2).as("price_2"),
          element_at($"top3", 3).as("price_3"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
      t[1] AS price_1, t[2] AS price_2, t[3] AS price_3
      FROM (SELECT l_returnflag,
              list(l_extendedprice ORDER BY l_extendedprice DESC) AS t
            FROM lineitem GROUP BY l_returnflag)
      ORDER BY l_returnflag"""))

  private val qApproxDistinct = Q(
    "q_approx_distinct",
    (s, d) => {
      import s.implicits._
      // HLL sketches: engines' estimators differ, so no SQL oracle — the
      // driver records its rows-only check; ApproxSpec bounds the error
      // against exact counts instead.
      lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_orderkey").as("approx_orders"),
          approx_count_distinct($"l_partkey").as("approx_parts"))
        .orderBy($"l_returnflag")
    },
    None)

  /** Approximate distinct count that IS oracle-checkable — the KMV
    * (k-minimum-values / bottom-k) sketch [[qApproxDistinct]]'s HLL
    * cannot be: hash every value with an engine-portable hash (60 bits
    * of md5 — `conv`/`::BIGINT` of the same 15 hex chars on both
    * engines), keep the k smallest DISTINCT hashes, and estimate
    * distinct ≈ (k−1) · 2⁶⁰ / h₍ₖ₎. Every step is exact integer
    * arithmetic both engines replay bit-for-bit — the estimator itself
    * is under the hash gate, not just its error bound. Stated as
    * `(k−1) · (2⁶⁰ div h₍ₖ₎)` because `(k−1) · 2⁶⁰` overflows BIGINT.
    * Scale shape: the top-k runs as `sort.limit(k)` —
    * `TakeOrderedAndProject`, per-partition bottom-k merged on the
    * driver, never a global sort — over the DISTINCT hash table (one
    * map-side-combined exchange); the two 1-row sketch frames meet by
    * broadcast. Exact counts ride along so the artifact records the
    * observed error in permille.
    */
  private val qKmvDistinct = Q(
    "q_kmv_distinct",
    (s, d) => {
      import s.implicits._
      val k = 256
      val two60 = 1152921504606846976L // 2^60
      def sketch(c: String, tag: String) =
        lineitem(s, d)
          .select(expr(
            s"CAST(conv(substring(md5(CAST($c AS STRING)), 1, 15), 16, 10) AS BIGINT)")
            .as("hv"))
          .distinct()
          .orderBy($"hv").limit(k)
          .agg(max($"hv").as(s"hk_$tag"), count(lit(1)).as(s"n_$tag"))
      def estimate(tag: String) =
        when(col(s"n_$tag") < k, col(s"n_$tag"))
          .otherwise(lit(k - 1L) * call_function("div", lit(two60),
            col(s"hk_$tag")))
          .as(s"est_$tag")
      val exact = lineitem(s, d)
        .agg(countDistinct($"l_orderkey").as("exact_orders"),
          countDistinct($"l_partkey").as("exact_parts"))
      sketch("l_orderkey", "orders")
        .crossJoin(broadcast(sketch("l_partkey", "parts")))
        .crossJoin(broadcast(exact))
        .select(estimate("orders"), $"exact_orders",
          estimate("parts"), $"exact_parts")
        .select($"est_orders", $"exact_orders", $"est_parts", $"exact_parts",
          // integral div, not Column./ — double division then cast
          // truncates where the oracle floors (same trap as scale16)
          call_function("div",
            abs($"est_orders" - $"exact_orders") * 1000L, $"exact_orders")
            .as("err_orders_permille"),
          call_function("div",
            abs($"est_parts" - $"exact_parts") * 1000L, $"exact_parts")
            .as("err_parts_permille"))
    },
    Some("""WITH ho AS (
        SELECT DISTINCT
          ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS hv
        FROM lineitem),
      hp AS (
        SELECT DISTINCT
          ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS hv
        FROM lineitem),
      so AS (SELECT max(hv) AS hk, count(*) AS n
        FROM (SELECT hv FROM ho ORDER BY hv LIMIT 256)),
      sp AS (SELECT max(hv) AS hk, count(*) AS n
        FROM (SELECT hv FROM hp ORDER BY hv LIMIT 256)),
      x AS (SELECT count(DISTINCT l_orderkey) AS exact_orders,
          count(DISTINCT l_partkey) AS exact_parts FROM lineitem)
      SELECT
        CAST(CASE WHEN so.n < 256 THEN so.n
          ELSE 255 * (1152921504606846976 // so.hk) END AS BIGINT)
          AS est_orders,
        CAST(x.exact_orders AS BIGINT) AS exact_orders,
        CAST(CASE WHEN sp.n < 256 THEN sp.n
          ELSE 255 * (1152921504606846976 // sp.hk) END AS BIGINT)
          AS est_parts,
        CAST(x.exact_parts AS BIGINT) AS exact_parts,
        CAST(abs(CASE WHEN so.n < 256 THEN so.n
            ELSE 255 * (1152921504606846976 // so.hk) END - x.exact_orders)
          * 1000 // x.exact_orders AS BIGINT) AS err_orders_permille,
        CAST(abs(CASE WHEN sp.n < 256 THEN sp.n
            ELSE 255 * (1152921504606846976 // sp.hk) END - x.exact_parts)
          * 1000 // x.exact_parts AS BIGINT) AS err_parts_permille
      FROM so, sp, x"""))

  private val qNullHandling = Q(
    "q_null_handling",
    (s, d) => {
      import s.implicits._
      // the tables carry no nulls, so manufacture them: NULLIF on a value
      // bucket, then exercise null-aware grouping / counting / coalesce
      lineitem(s, d)
        .select(nullif($"l_returnflag", lit("N")).as("flag_or_null"),
          $"l_quantity")
        .groupBy($"flag_or_null")
        .agg(count(lit(1)).as("n_rows"),
          count($"flag_or_null").as("n_nonnull_key"),
          coalesce(max($"flag_or_null"), lit("<null>")).as("key_disp"))
        .orderBy($"flag_or_null".asc_nulls_first)
    },
    Some("""SELECT nullif(l_returnflag, 'N') AS flag_or_null,
      count(*) AS n_rows,
      count(nullif(l_returnflag, 'N')) AS n_nonnull_key,
      coalesce(max(nullif(l_returnflag, 'N')), '<null>') AS key_disp
      FROM lineitem GROUP BY 1
      ORDER BY flag_or_null ASC NULLS FIRST"""))

  private val qPagination = Q(
    "q_pagination",
    (s, d) => {
      import s.implicits._
      orders(s, d)
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .offset(100).limit(25)
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 25 OFFSET 100"""))

  private val qArgmaxLatest = Q(
    "q_argmax_latest",
    (s, d) => {
      import s.implicits._
      // the keep-latest-version-per-key dedupe idiom (argmax): window
      // row_number over a total per-key order, keep rank 1. One shuffle on
      // the key; at scale this is the standard CDC-compaction shape.
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderkey".as("latest_order"),
          $"o_orderdate".as("latest_date"), $"o_totalprice".as("latest_price"))
        .orderBy($"o_custkey")
    },
    Some("""SELECT o_custkey, o_orderkey AS latest_order,
      o_orderdate AS latest_date, o_totalprice AS latest_price
      FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
      ORDER BY o_custkey"""))

  private val qUnpivot = Q(
    "q_unpivot",
    (s, d) => {
      // wide→long reshape: stack() is Spark's generator-based unpivot (no
      // shuffle — a per-row flatMap)
      part(s, d).selectExpr("p_partkey",
          "stack(2, 'retailprice', p_retailprice, 'size', CAST(p_size AS DOUBLE)) AS (attr, val)")
        .orderBy(col("p_partkey"), col("attr"))
    },
    Some("""SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
      UNION ALL
      SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
      ORDER BY p_partkey, attr"""))

  private val qExplodedJoin = Q(
    "q_exploded_join",
    (s, d) => {
      import s.implicits._
      // generator in the FROM position (LATERAL VIEW explode): token-level
      // rows from a string column, re-aggregated — explode is a per-row
      // flatMap (no shuffle); only the groupBy shuffles, on the token
      part(s, d)
        .select($"p_partkey", explode(split($"p_name", " ")).as("tok"))
        .groupBy($"tok")
        .agg(count(lit(1)).as("n_parts"), min($"p_partkey").as("first_part"))
        .orderBy($"tok")
    },
    Some("""SELECT tok, count(*) AS n_parts, min(p_partkey) AS first_part
      FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS tok FROM part)
      GROUP BY tok ORDER BY tok"""))

  private val qMomentStats = Q(
    "q_moment_stats",
    (s, d) => {
      import s.implicits._
      // variance/stddev via exact decimal moments: avg/stddev over raw
      // doubles is partition-order-dependent, but n / Σx / Σx² as exact
      // decimals are order-free, and both engines then evaluate the same
      // closed-form double expression on identical inputs. The same
      // moment-sketch shape is how distributed stats merge at scale
      // (partial-aggregatable, one shuffle).
      val sq = (dec2($"l_quantity") * dec2($"l_quantity"))
        .cast(DecimalType(28, 4))
      lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum(dec2($"l_quantity")).as("s"),
          sum(sq).as("ss"))
        .select($"l_returnflag", $"n_rows",
          ($"s".cast(DoubleType) / $"n_rows").as("mean_qty"),
          (($"ss".cast(DoubleType) - $"s".cast(DoubleType) * $"s".cast(DoubleType) / $"n_rows")
            / ($"n_rows" - 1)).as("var_qty"),
          sqrt(($"ss".cast(DoubleType) - $"s".cast(DoubleType) * $"s".cast(DoubleType) / $"n_rows")
            / ($"n_rows" - 1)).as("std_qty"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH m AS (
        SELECT l_returnflag, count(*) AS n_rows,
          sum(CAST(l_quantity AS DECIMAL(18,2))) AS s,
          sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS ss
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n_rows,
        CAST(s AS DOUBLE) / n_rows AS mean_qty,
        (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_rows) / (n_rows - 1) AS var_qty,
        sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_rows) / (n_rows - 1)) AS std_qty
      FROM m ORDER BY l_returnflag"""))

  private val qSqlCte = Q(
    "q_sql_cte",
    (s, d) => {
      // the pure-SQL entry point: tables registered as temp views
      // ([[graft.sources.Catalog]]), the query text handed to spark.sql —
      // same CTE text runs on both engines
      graft.sources.Catalog.registerAll(s, d)
      s.sql("""WITH region_counts AS (
          SELECT n_regionkey, count(*) AS n_nations FROM nation GROUP BY n_regionkey)
        SELECT r_name, n_nations FROM region
        JOIN region_counts ON r_regionkey = n_regionkey
        ORDER BY r_name""")
    },
    Some("""WITH region_counts AS (
        SELECT n_regionkey, count(*) AS n_nations FROM nation GROUP BY n_regionkey)
      SELECT r_name, n_nations FROM region
      JOIN region_counts ON r_regionkey = n_regionkey
      ORDER BY r_name"""))

  /** SQL pipe syntax (Spark 4's `|>` operator chain) — the same filtered
    * aggregation a user would write as GROUP BY + HAVING, expressed as a
    * linear pipeline. Surface parity matters: a query written in either
    * dialect must plan identically (pipe stages lower to the same
    * Catalyst operators — filter pushdown, partial aggregation and the
    * rest apply unchanged). The oracle is the plain-SQL equivalent, so
    * the driver proves dialect equivalence every round.
    */
  private val qPipeSyntax = Q(
    "q_pipe_syntax",
    (s, d) => {
      graft.sources.Catalog.registerAll(s, d)
      s.sql("""FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |> EXTEND CAST(l_quantity AS DECIMAL(18,2)) AS qty
        |> AGGREGATE count(*) AS n_rows, CAST(sum(qty) AS DOUBLE) AS sum_qty
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_rows > 10
        |> SELECT l_returnflag, l_linestatus, n_rows, sum_qty
        |> ORDER BY l_returnflag, l_linestatus""")
    },
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      HAVING count(*) > 10
      ORDER BY l_returnflag, l_linestatus"""))

  /** SQL-defined scalar UDF (Spark 4's `CREATE FUNCTION … RETURN expr`) —
    * the declarative sibling of the adhesive JAVA/CLASS/SCALA DDL: the
    * body is a SQL expression, so Catalyst inlines it into the plan
    * (full codegen, pushdown through it) instead of calling out to
    * opaque bytecode. TEMPORARY + RETURN-body statements must pass
    * through the adhesive DDL interceptor untouched (its grammar requires
    * `AS '<body>'`), which this entry proves in every session that loads
    * the extensions. Fixed-point decimal keeps the sum order-free.
    */
  private val qSqlUdf = Q(
    "q_sql_udf",
    (s, d) => {
      graft.sources.Catalog.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(
          p DOUBLE, d DOUBLE) RETURNS DECIMAL(18,4)
        RETURN CAST(CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,2)))
          AS DECIMAL(18,4))""")
      s.sql("""SELECT l_returnflag,
          CAST(sum(graft_disc_price(l_extendedprice, l_discount)) AS DOUBLE)
            AS revenue,
          count(*) AS n_items
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    Some("""SELECT l_returnflag,
        CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
          AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** SQL-defined TABLE function — a parameterized view: the body is a
    * SELECT, callers use it in FROM, and resolution inlines it so the
    * underlying scan keeps its pushdown (the lint + this oracle would
    * catch a regression to a materializing implementation).
    */
  private val qSqlTableUdf = Q(
    "q_sql_table_udf",
    (s, d) => {
      graft.sources.Catalog.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_qty_band(
          lo DOUBLE, hi DOUBLE)
        RETURNS TABLE(flag STRING, qty DECIMAL(18,2))
        RETURN SELECT l_returnflag, CAST(l_quantity AS DECIMAL(18,2))
          FROM lineitem WHERE l_quantity BETWEEN lo AND hi""")
      s.sql("""SELECT flag, count(*) AS n,
          CAST(sum(qty) AS DOUBLE) AS sum_qty
        FROM graft_qty_band(10.0, 20.0) GROUP BY flag ORDER BY flag""")
    },
    Some("""SELECT l_returnflag AS flag, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem WHERE l_quantity BETWEEN 10.0 AND 20.0
      GROUP BY l_returnflag ORDER BY flag"""))

  /** Recursive CTE (Spark 4's WITH RECURSIVE): generate the month
    * calendar spanning the order history, then left-join monthly order
    * counts — the gap-filling pattern that surfaces zero-activity months
    * a plain GROUP BY silently drops. The recursion is a driver-side
    * 80-iteration loop over one-row frames (bounded by
    * spark.sql.cteRecursionLevelLimit, default 100); the real work — the
    * join + aggregate against the fact table — stays one distributed
    * pass. Same query text on both engines.
    */
  private val qRecursiveCte = Q(
    "q_recursive_cte",
    (s, d) => {
      graft.sources.Catalog.registerAll(s, d)
      s.sql("""WITH RECURSIVE months(month_start) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT add_months(month_start, 1) FROM months
          WHERE month_start < DATE '2001-08-01')
        SELECT CAST(m.month_start AS TIMESTAMP) AS month_start,
          count(o.o_orderkey) AS n_orders,
          CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
        FROM months m LEFT JOIN orders o
          ON CAST(date_trunc('MONTH', o.o_orderdate) AS DATE) = m.month_start
        GROUP BY m.month_start ORDER BY month_start""")
    },
    Some("""WITH RECURSIVE months(month_start) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT CAST(month_start + INTERVAL 1 MONTH AS DATE) FROM months
        WHERE month_start < DATE '2001-08-01')
      SELECT CAST(m.month_start AS TIMESTAMP) AS month_start,
        count(o.o_orderkey) AS n_orders,
        CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
      FROM months m LEFT JOIN orders o
        ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = m.month_start
      GROUP BY m.month_start ORDER BY month_start"""))

  private val qSaltedAgg = Q(
    "q_salted_agg",
    (s, d) => {
      import s.implicits._
      // two-stage salted aggregation — the skew-mitigation shape for hot
      // keys: stage 1 shuffles on (key, salt) so one hot key spreads over
      // 8 reducers; stage 2 re-aggregates the 8 partials per key. The
      // result is identical to the plain groupBy (which IS the oracle),
      // proving the decomposition loses nothing. With AQE's skew handling
      // off or overwhelmed, this is the manual knob (see
      // operators.SkewJoin for the join-side twin).
      val salted = events(s, d)
        .select($"user_id", $"value",
          (pmod($"event_id", lit(8))).as("salt"))
        .groupBy($"user_id", $"salt")
        .agg(count(lit(1)).as("pn"), sum(dec2($"value")).as("pv"))
      salted
        .groupBy($"user_id")
        .agg(sum($"pn").as("n_events"),
          asDec(sum($"pv"), 2).as("total_value"))
        .orderBy($"user_id")
    },
    Some("""SELECT user_id, count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY user_id ORDER BY user_id"""))

  private val qLateral = Q(
    "q_lateral",
    (s, d) => {
      // correlated LATERAL subquery (SQL-level): for every region, the
      // top nation by customer count — the "top-1 per outer row" shape.
      // Catalyst decorrelates this into a join + window rather than
      // re-executing the inner query per row, which is what makes the
      // construct usable at scale.
      graft.sources.Catalog.registerAll(s, d)
      s.sql("""SELECT r_name, top_nation, n_cust FROM region,
        LATERAL (
          SELECT n_name AS top_nation, count(*) AS n_cust
          FROM nation JOIN customer ON n_nationkey = c_nationkey
          WHERE n_regionkey = r_regionkey
          GROUP BY n_name ORDER BY n_cust DESC, n_name LIMIT 1)
        ORDER BY r_name""")
    },
    Some("""SELECT r_name, top_nation, n_cust FROM region,
      LATERAL (
        SELECT n_name AS top_nation, count(*) AS n_cust
        FROM nation JOIN customer ON n_nationkey = c_nationkey
        WHERE n_regionkey = r_regionkey
        GROUP BY n_name ORDER BY n_cust DESC, n_name LIMIT 1) t
      ORDER BY r_name"""))

  private val qArrayFuncs = Q(
    "q_array_funcs",
    (s, d) => {
      import s.implicits._
      // the array scalar-function library over tokenized strings — arrays
      // stay internal (scalar outputs only; see q_array_agg on the driver
      // compare)
      part(s, d)
        .select($"p_partkey", array_sort(split($"p_name", " ")).as("toks"))
        .select($"p_partkey",
          size($"toks").cast(LongType).as("n_toks"),
          element_at($"toks", 1).as("first_tok"),
          element_at($"toks", -1).as("last_tok"),
          array_join(slice($"toks", 1, 2), "-").as("first_two"),
          array_contains($"toks", "green").cast(LongType).as("has_green"),
          array_position($"toks", "steel").cast(LongType).as("steel_pos"))
        .orderBy($"p_partkey")
    },
    Some("""WITH t AS (
        SELECT p_partkey, list_sort(string_split(p_name, ' ')) AS toks FROM part)
      SELECT p_partkey,
        CAST(len(toks) AS BIGINT) AS n_toks,
        toks[1] AS first_tok,
        toks[-1] AS last_tok,
        array_to_string(toks[1:2], '-') AS first_two,
        CAST(list_contains(toks, 'green') AS BIGINT) AS has_green,
        CAST(coalesce(list_position(toks, 'steel'), 0) AS BIGINT) AS steel_pos
      FROM t ORDER BY p_partkey"""))

  private val qMapStruct = Q(
    "q_map_struct",
    (s, d) => {
      import s.implicits._
      // MapType + StructType through the engine: build, access by key /
      // field, emit scalars
      part(s, d)
        .select($"p_partkey",
          map(lit("brand"), $"p_brand", lit("type"), $"p_type").as("attrs"),
          struct($"p_size".as("size"), $"p_retailprice".as("price")).as("dims"))
        .select($"p_partkey",
          element_at($"attrs", "brand").as("brand"),
          element_at($"attrs", "type").as("typ"),
          $"dims.size".cast(LongType).as("sz"),
          $"dims.price".as("price"),
          size(map_keys($"attrs")).cast(LongType).as("n_keys"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
      p_brand AS brand, p_type AS typ,
      CAST(p_size AS BIGINT) AS sz, p_retailprice AS price,
      CAST(2 AS BIGINT) AS n_keys
      FROM part ORDER BY p_partkey"""))

  /** Pearson correlation / covariance per group, built from exact decimal
    * moment sums so the result is order-independent (Spark's builtin
    * `corr` aggregates doubles and is partition-order dependent — fine
    * numerically, unusable for bit-exact oracles). Only the final formula
    * runs in double: every step there (mul, div, sqrt) is correctly
    * rounded IEEE, so both engines produce identical bits. One map-side-
    * combined shuffle over the group keys at any scale.
    */
  private val qCorr = Q(
    "q_corr_stats",
    (s, d) => {
      import s.implicits._
      val x = dec2($"l_quantity")
      val y = dec2($"l_extendedprice")
      lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(x).cast(DecimalType(38, 2)).as("sx"),
          sum(y).cast(DecimalType(38, 2)).as("sy"),
          sum((x * x).cast(DecimalType(18, 4))).cast(DecimalType(38, 4)).as("sxx"),
          sum((y * y).cast(DecimalType(18, 4))).cast(DecimalType(38, 4)).as("syy"),
          sum((x * y).cast(DecimalType(18, 4))).cast(DecimalType(38, 4)).as("sxy"))
        .select($"l_returnflag", $"n",
          // the final double chain can differ by 1 ulp across engines
          // (C compilers may contract a - b*c into FMA; the JVM never
          // does) — pin both outputs through a fixed-scale decimal so
          // last-ulp noise rounds away identically on both sides
          (($"sxy".cast(DoubleType) - $"sx".cast(DoubleType) * $"sy".cast(DoubleType) / $"n") / $"n")
            .cast(DecimalType(26, 8)).cast(DoubleType).as("covar_pop"),
          (($"sxy".cast(DoubleType) - $"sx".cast(DoubleType) * $"sy".cast(DoubleType) / $"n") /
            sqrt(($"sxx".cast(DoubleType) - $"sx".cast(DoubleType) * $"sx".cast(DoubleType) / $"n") *
                 ($"syy".cast(DoubleType) - $"sy".cast(DoubleType) * $"sy".cast(DoubleType) / $"n")))
            .cast(DecimalType(16, 14)).cast(DoubleType).as("corr"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH m AS (
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
          CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
          CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS syy,
          CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        CAST(CAST((sxy - sx * sy / n) / n AS DECIMAL(26,8)) AS DOUBLE) AS covar_pop,
        CAST(CAST((sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
          AS DECIMAL(16,14)) AS DOUBLE) AS corr
      FROM m ORDER BY l_returnflag"""))

  /** Error-safe arithmetic: `try_divide` / `try_cast` return NULL where
    * strict evaluation would raise — the ANSI-mode-friendly form of the
    * reference's null-on-error UDF semantics (Adhesive.java:93-99 returns
    * null through the same path). The oracle mirrors with NULLIF /
    * TRY_CAST. Pure per-row projection, no shuffle.
    */
  private val qTryArith = Q(
    "q_try_arith",
    (s, d) => {
      import s.implicits._
      lineitem(s, d)
        .filter($"l_orderkey" <= 1000)
        .select($"l_orderkey", $"l_linenumber".cast(LongType).as("l_linenumber"),
          $"l_partkey", $"l_suppkey", $"l_quantity",
          expr("try_divide(l_extendedprice, CAST(CAST(l_quantity AS BIGINT) % 3 AS DOUBLE))")
            .as("unit3"),
          expr("try_cast(concat('x', CAST(l_partkey AS STRING)) AS BIGINT)").as("bad_cast"),
          expr("try_cast(CAST(l_suppkey AS STRING) AS BIGINT)").as("good_cast"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
          $"l_quantity")
    },
    Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        l_partkey, l_suppkey, l_quantity,
        l_extendedprice / CAST(NULLIF(CAST(l_quantity AS BIGINT) % 3, 0) AS DOUBLE) AS unit3,
        TRY_CAST('x' || CAST(l_partkey AS VARCHAR) AS BIGINT) AS bad_cast,
        TRY_CAST(CAST(l_suppkey AS VARCHAR) AS BIGINT) AS good_cast
      FROM lineitem WHERE l_orderkey <= 1000
      ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity"""))

  /** ANSI `LISTAGG ... WITHIN GROUP` (new in Spark 4) — ordered string
    * aggregation through the SQL-standard syntax, including the DISTINCT
    * form; equivalent to DuckDB's ordered string_agg. The explicit WITHIN
    * GROUP order is what makes the concatenation deterministic across
    * partitionings (an unordered listagg would be partition-order-
    * dependent and could never hash-match).
    */
  private val qListagg = Q(
    "q_listagg",
    (s, d) => {
      nation(s, d).createOrReplaceTempView("graft_listagg_nation")
      s.sql("""SELECT n_regionkey,
        listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name) AS nations,
        listagg(DISTINCT substring(n_name, -1, 1), '')
          WITHIN GROUP (ORDER BY substring(n_name, -1, 1)) AS last_chars
        FROM graft_listagg_nation
        GROUP BY n_regionkey ORDER BY n_regionkey""")
    },
    Some("""SELECT n_regionkey,
      string_agg(n_name, '|' ORDER BY n_name) AS nations,
      string_agg(DISTINCT substr(n_name, -1, 1), ''
        ORDER BY substr(n_name, -1, 1)) AS last_chars
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  val all: Seq[Q] = Seq(
    q1, q3, q5, q6, qSemi, qAnti, qOuter, qWindowTopN, qWindowRunning,
    qWindowLag, qRollup, qCube, qSetOps, qDistinctAgg, qTopK, qScalarFuncs,
    qDateFuncs, qCaseWhen, qHaving, qScalarSubquery, qExistsCorr, qDimJoin,
    qPivot, qRegexp, qMinMax, qGroupingSets, qPercentiles, qApproxDistinct,
    qKmvDistinct,
    qWindowMisc, qScalarFuncs2, qDateArith, qArrayAgg, qTypedPipeline,
    qTopKAgg, qSetOpsAll, qJoinRange, qNullHandling, qPagination,
    qArgmaxLatest, qUnpivot, qExplodedJoin, qMomentStats, qSqlCte,
    qSaltedAgg, qArrayFuncs, qMapStruct, qLateral, qCorr, qTryArith,
    qRecursiveCte, qVariant, qListagg, qWindowFrames, qWindowTimeRange,
    qPipeSyntax, qSqlUdf, qSqlTableUdf)
}
