package graft.adhesive

import org.apache.spark.sql.SparkSession

/** Round-13 honesty study for the TABLE FUNCTION seam: what does the
  * dynamic `Inline`-generator UDF cost against built-in operators at a
  * 1M-row × 16-element fan-out (16M output rows), and when does it WIN?
  *
  *   sbt "Test/runMain graft.adhesive.TableFunctionFanoutStudyR13"
  *
  * Two workloads, identical outputs per pair:
  *
  * 1. **Stateless fan-out** `(pos, v)`: built-in `posexplode` (pure
  *    codegen) vs a table function emitting the same rows. Measured
  *    finding: the two are COMPARABLE (ratios ×0.86–×1.67 across runs —
  *    generator cost is dominated by materializing 64M output rows on
  *    both paths, and the UDF's boxing hides inside that). The study
  *    therefore asserts only the safety bound — the seam costs at most
  *    2× on a workload it adds nothing to — and reports the measured
  *    ratio rather than pretending a stable direction exists.
  * 2. **Stateful fan-out** `(pos, v, run)` — per-element RUNNING state:
  *    the built-in formulation needs `posexplode` + a window
  *    `sum over (partition by id order by pos)` — a 64M-row shuffle +
  *    sort — while the table function computes the running sum inside
  *    one `eval` per row, in-stage, zero shuffle. The UDF must win here:
  *    per-group sequential state is exactly what the generator seam
  *    expresses that relational operators pay a shuffle for.
  *
  * Both directions asserted (best of 3 passes each; the same noop
  * materialization discipline as graft.Bench). Results feed SCALE.md
  * §"Round-13 table-function fan-out".
  */
object TableFunctionFanoutStudyR13 {

  private val Rows = 4000000L
  private val K = 16

  private val StatelessDdl =
    """CREATE OR REPLACE TABLE FUNCTION tf_fan(ARRAY<BIGINT>) RETURNS TABLE(pos INT, v BIGINT) LANGUAGE JAVA AS '
      |import graft.adhesive.AdhesiveTableFunction;
      |import org.apache.spark.sql.Row;
      |import org.apache.spark.sql.RowFactory;
      |import java.util.*;
      |public class TfFan extends AdhesiveTableFunction {
      |  public List<Row> eval(Row a) {
      |    List<Long> xs = a.getList(0);
      |    List<Row> out = new ArrayList<>(xs.size());
      |    for (int i = 0; i < xs.size(); i++) out.add(RowFactory.create(i, xs.get(i)));
      |    return out;
      |  }
      |}
      |'""".stripMargin

  private val StatefulDdl =
    """CREATE OR REPLACE TABLE FUNCTION tf_fan_run(ARRAY<BIGINT>) RETURNS TABLE(pos INT, v BIGINT, run BIGINT) LANGUAGE JAVA AS '
      |import graft.adhesive.AdhesiveTableFunction;
      |import org.apache.spark.sql.Row;
      |import org.apache.spark.sql.RowFactory;
      |import java.util.*;
      |public class TfFanRun extends AdhesiveTableFunction {
      |  public List<Row> eval(Row a) {
      |    List<Long> xs = a.getList(0);
      |    List<Row> out = new ArrayList<>(xs.size());
      |    long run = 0;
      |    for (int i = 0; i < xs.size(); i++) { run += xs.get(i); out.add(RowFactory.create(i, xs.get(i), run)); }
      |    return out;
      |  }
      |}
      |'""".stripMargin

  /** Best-of-3 seconds to materialize `sql` through the noop sink. */
  private def timed(spark: SparkSession, sql: String): Double =
    (1 to 3).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      spark.sql(sql).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.adhesive.AdhesiveSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql(StatelessDdl); spark.sql(StatefulDdl)
    spark.range(0, Rows, 1, 32)
      .selectExpr("id", s"transform(sequence(1, $K), i -> id + CAST(i AS BIGINT)) AS xs")
      .createOrReplaceTempView("t_fan")

    // warm all four plans (codegen + instance cache) on a slice
    Seq(
      "SELECT id, pos, v FROM t_fan, LATERAL posexplode(xs) AS t(pos, v) WHERE id < 1000",
      "SELECT id, u.pos, u.v FROM t_fan, LATERAL tf_fan(xs) u WHERE id < 1000",
      """SELECT id, pos, v, sum(v) OVER (PARTITION BY id ORDER BY pos
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
         FROM (SELECT id, pos, v FROM t_fan, LATERAL posexplode(xs) AS t(pos, v))
         WHERE id < 1000""",
      "SELECT id, u.pos, u.v, u.run FROM t_fan, LATERAL tf_fan_run(xs) u WHERE id < 1000"
    ).foreach(q => spark.sql(q).write.format("noop").mode("overwrite").save())

    val builtinFlat = timed(spark,
      "SELECT id, pos, v FROM t_fan, LATERAL posexplode(xs) AS t(pos, v)")
    val udfFlat = timed(spark,
      "SELECT id, u.pos, u.v FROM t_fan, LATERAL tf_fan(xs) u")
    // the built-in route to per-element running state: window over the
    // exploded rows — 16M rows through an Exchange + Sort
    val builtinRun = timed(spark,
      """SELECT id, pos, v, sum(v) OVER (PARTITION BY id ORDER BY pos
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        FROM (SELECT id, pos, v FROM t_fan, LATERAL posexplode(xs) AS t(pos, v))""")
    val udfRun = timed(spark,
      "SELECT id, u.pos, u.v, u.run FROM t_fan, LATERAL tf_fan_run(xs) u")

    println("== TableFunctionFanoutStudyR13 (4M rows x 16 elements) ==")
    println(f"stateless: posexplode $builtinFlat%6.2f s   table-UDF $udfFlat%6.2f s   (UDF overhead x${udfFlat / builtinFlat}%.2f)")
    println(f"stateful : window     $builtinRun%6.2f s   table-UDF $udfRun%6.2f s   (UDF speedup x${builtinRun / udfRun}%.2f)")
    // direction 1 (safety bound): on a workload where the seam adds
    // nothing, it must not cost more than 2× the built-in
    assert(udfFlat < builtinFlat * 2,
      f"the table UDF ($udfFlat%.2f) costs >2x posexplode ($builtinFlat%.2f) on stateless fan-out")
    // direction 2: the in-stage stateful generator must beat the
    // shuffle+sort window route
    assert(udfRun < builtinRun,
      f"the stateful table UDF ($udfRun%.2f) should beat explode+window ($builtinRun%.2f)")
    spark.stop()
  }
}
