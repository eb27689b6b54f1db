package graft.adhesive

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** `CREATE TABLE FUNCTION` end-to-end: DDL parse, FROM-position calls,
  * LATERAL correlation, empty/null row sets, exact-arg enforcement, and
  * the error paths.
  */
class TableFunctionDdlSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val SeriesDdl =
    """CREATE OR REPLACE TABLE FUNCTION gseries(BIGINT) RETURNS TABLE(n BIGINT, sq BIGINT) LANGUAGE JAVA AS '
      |import graft.adhesive.AdhesiveTableFunction;
      |import org.apache.spark.sql.Row;
      |import org.apache.spark.sql.RowFactory;
      |import java.util.ArrayList;
      |import java.util.List;
      |public class GSeries extends AdhesiveTableFunction {
      |  public List<Row> eval(Row args) {
      |    long k = args.getLong(0);
      |    List<Row> out = new ArrayList<>();
      |    for (long i = 1; i <= k; i++) out.add(RowFactory.create(i, i * i));
      |    return out;
      |  }
      |}
      |'""".stripMargin

  test("FROM-position call over a literal argument") {
    spark.sql(SeriesDdl)
    val rows = spark.sql(
      "SELECT n, sq FROM gseries(CAST(4 AS BIGINT)) ORDER BY n")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 1L), (2L, 4L), (3L, 9L), (4L, 16L)))
  }

  test("LATERAL correlation: eval runs once per outer row") {
    spark.sql(SeriesDdl)
    spark.range(1, 4).selectExpr("id AS k").createOrReplaceTempView("t_k")
    val rows = spark.sql(
      """SELECT t_k.k, s.n, s.sq FROM t_k, LATERAL gseries(t_k.k) s
        |ORDER BY k, n""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // k=1 -> 1 row, k=2 -> 2 rows, k=3 -> 3 rows
    assert(rows.length == 6)
    assert(rows.toSeq == Seq((1L, 1L, 1L), (2L, 1L, 1L), (2L, 2L, 4L),
      (3L, 1L, 1L), (3L, 2L, 4L), (3L, 3L, 9L)))
  }

  test("empty result list produces no rows; a tokenizer fans text out") {
    spark.sql(
      """CREATE OR REPLACE TABLE FUNCTION gtokens(STRING) RETURNS TABLE(pos INT, token STRING) LANGUAGE JAVA AS '
        |import graft.adhesive.AdhesiveTableFunction;
        |import org.apache.spark.sql.Row;
        |import org.apache.spark.sql.RowFactory;
        |import java.util.ArrayList;
        |import java.util.List;
        |public class GTokens extends AdhesiveTableFunction {
        |  public List<Row> eval(Row args) {
        |    List<Row> out = new ArrayList<>();
        |    if (args.isNullAt(0)) return out;
        |    String s = args.getString(0).trim();
        |    if (s.isEmpty()) return out;
        |    String[] parts = s.split("\\s+");
        |    for (int i = 0; i < parts.length; i++) out.add(RowFactory.create(i, parts[i]));
        |    return out;
        |  }
        |}
        |'""".stripMargin)
    Seq((1L, "a b c"), (2L, ""), (3L, "d")).toDF("id", "s")
      .createOrReplaceTempView("t_tok")
    val rows = spark.sql(
      """SELECT id, tk.pos, tk.token FROM t_tok, LATERAL gtokens(t_tok.s) tk
        |ORDER BY id, pos""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(rows.toSeq == Seq((1L, 0, "a"), (1L, 1, "b"), (1L, 2, "c"),
      (3L, 0, "d")), "empty-string doc must contribute zero rows")
  }

  test("container-typed output columns: TABLE(xs ARRAY<BIGINT>, ...)") {
    spark.sql(
      """CREATE OR REPLACE TABLE FUNCTION gwindows(BIGINT) RETURNS TABLE(w INT, xs ARRAY<BIGINT>) LANGUAGE JAVA AS '
        |import graft.adhesive.AdhesiveTableFunction;
        |import org.apache.spark.sql.Row;
        |import org.apache.spark.sql.RowFactory;
        |import java.util.ArrayList;
        |import java.util.List;
        |public class GWindows extends AdhesiveTableFunction {
        |  // sliding windows of width 2 over 1..k — an ARRAY column per row
        |  public List<Row> eval(Row args) {
        |    long k = args.getLong(0);
        |    List<Row> out = new ArrayList<>();
        |    for (int i = 1; i + 1 <= k; i++) {
        |      List<Long> win = new ArrayList<>();
        |      win.add((long) i); win.add((long) i + 1);
        |      out.add(RowFactory.create(i, win));
        |    }
        |    return out;
        |  }
        |}
        |'""".stripMargin)
    val rows = spark.sql(
      "SELECT w, xs FROM gwindows(CAST(4 AS BIGINT)) ORDER BY w")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toList))
    assert(rows.toSeq == Seq((1, List(1L, 2L)), (2, List(2L, 3L)),
      (3, List(3L, 4L))))
  }

  test("MAP<STRING,BIGINT> argument: LATERAL fan-out of map entries") {
    spark.sql(
      """CREATE OR REPLACE TABLE FUNCTION gentries(MAP<STRING,BIGINT>) RETURNS TABLE(k STRING, v BIGINT) LANGUAGE JAVA AS '
        |import graft.adhesive.AdhesiveTableFunction;
        |import org.apache.spark.sql.Row;
        |import org.apache.spark.sql.RowFactory;
        |import java.util.*;
        |public class GEntries extends AdhesiveTableFunction {
        |  public List<Row> eval(Row args) {
        |    List<Row> out = new ArrayList<>();
        |    if (args.isNullAt(0)) return out;
        |    Map<String, Long> m = args.getJavaMap(0);
        |    List<String> ks = new ArrayList<>(m.keySet());
        |    Collections.sort(ks);
        |    for (String k : ks) out.add(RowFactory.create(k, m.get(k)));
        |    return out;
        |  }
        |}
        |'""".stripMargin)
    spark.range(1, 3)
      .selectExpr("id", "map(concat('a', id), id, concat('b', id), id * 10) AS m")
      .createOrReplaceTempView("t_maps")
    val rows = spark.sql(
      """SELECT t_maps.id, e.k, e.v FROM t_maps, LATERAL gentries(t_maps.m) e
        |ORDER BY id, k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "a1", 1L), (1L, "b1", 10L),
      (2L, "a2", 2L), (2L, "b2", 20L)))
  }

  test("exact argument types are enforced (StrictArg on the packed struct)") {
    spark.sql(SeriesDdl)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gseries(4)").collect() // INT literal, not BIGINT
    }
    assert(e.getMessage.contains("exact type"))
  }

  test("DROP TEMPORARY FUNCTION clears the tableFunctionRegistry entry") {
    spark.sql(SeriesDdl.replace("gseries", "gseries_drop"))
    assert(spark.sql("SELECT count(*) AS c FROM gseries_drop(CAST(3 AS BIGINT))")
      .head().getLong(0) == 3L)
    // SessionCatalog.dropTempFunction falls through to the
    // tableFunctionRegistry when the name is not a scalar temp function,
    // so Spark's native DROP completes the table-function lifecycle too
    spark.sql("DROP TEMPORARY FUNCTION gseries_drop")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM gseries_drop(CAST(3 AS BIGINT))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("gseries_drop"))
    // and the dropped name is re-creatable (full create→drop→create cycle)
    spark.sql(SeriesDdl.replace("gseries", "gseries_drop"))
    assert(spark.sql("SELECT count(*) AS c FROM gseries_drop(CAST(2 AS BIGINT))")
      .head().getLong(0) == 2L)
    spark.sql("DROP TEMPORARY FUNCTION gseries_drop")
  }

  test("a non-table body under CREATE TABLE FUNCTION is rejected at DDL time") {
    val e = intercept[Exception] {
      spark.sql(
        """CREATE TABLE FUNCTION bad_tf(BIGINT) RETURNS TABLE(x BIGINT) LANGUAGE CLASS
          |AS 'graft.adhesive.example.BasicAddExample'""".stripMargin)
    }
    assert(e.getMessage.contains("does not extend") &&
      e.getMessage.contains("AdhesiveTableFunction"))
  }

  test("grammar guards: TABLE kind and TABLE(...) schema require each other") {
    val e = intercept[AdhesiveException] {
      AdhesiveDdl.parse(
        "CREATE TABLE FUNCTION f(BIGINT) RETURNS BIGINT AS 'class X {}'")
    }
    assert(e.getMessage.contains("requires RETURNS TABLE"))
    val e2 = intercept[AdhesiveException] {
      AdhesiveDdl.parse(
        "CREATE FUNCTION f(BIGINT) RETURNS TABLE(x BIGINT) AS 'class X {}'")
    }
    assert(e2.getMessage.contains("requires CREATE TABLE FUNCTION"))
    // DECIMAL(p,s) column types nest inside the TABLE(...) token
    val st = AdhesiveDdl.parse(
      "CREATE TABLE FUNCTION f(BIGINT) RETURNS TABLE(a BIGINT, p DECIMAL(12,2)) AS 'class X {}'")
      .get.tableSchema.get
    assert(st.fieldNames.toSeq == Seq("a", "p"))
    assert(st("p").dataType == org.apache.spark.sql.types.DecimalType(12, 2))
    // Spark's native SQL table UDF (RETURN body, no AS) still delegates
    assert(AdhesiveDdl.parse(
      "CREATE FUNCTION f(lo DOUBLE) RETURNS TABLE(q DOUBLE) RETURN SELECT lo").isEmpty)
  }
}
