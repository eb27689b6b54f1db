package graft.adhesive

import java.io.FileOutputStream
import java.util.jar.{JarEntry, JarOutputStream}

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** `LANGUAGE CLASS ... USING JAR '<path>'` — reference `new_with_jar`
  * parity (`/root/reference/src/jvm.rs:44-61`): the reference boots its
  * embedded JVM with a user-supplied jar on the classpath; here the jar is
  * resolved lazily per session through a cached URLClassLoader. The spec
  * builds a real jar at test time containing a class that is NOT on the
  * launch classpath, registers it through the DDL, and calls it.
  */
class UsingJarSpec extends AnyFunSuite {

  private def buildJar(fqn: String, source: String): String = {
    val bytecode = InMemoryJavaCompiler.compile(fqn, source)
    val jar = java.nio.file.Files.createTempFile("adhesive-usingjar", ".jar")
    val out = new JarOutputStream(new FileOutputStream(jar.toFile))
    try bytecode.foreach { case (name, bytes) =>
      out.putNextEntry(new JarEntry(name.replace('.', '/') + ".class"))
      out.write(bytes)
      out.closeEntry()
    } finally out.close()
    jar.toString
  }

  private val fqn = "jartest.JarMul"
  private lazy val jarPath = buildJar(fqn,
    """package jartest;
      |import graft.adhesive.Adhesive;
      |import org.apache.spark.sql.Row;
      |public class JarMul extends Adhesive {
      |  public Object compute(Row row) { return row.getLong(0) * row.getLong(1); }
      |}
      |""".stripMargin)

  test("the jar class is genuinely absent from the launch classpath") {
    intercept[ClassNotFoundException] {
      Class.forName(fqn, true, getClass.getClassLoader)
    }
  }

  test("USING JAR registers a class from an off-classpath jar and a query calls it") {
    val spark = TestSpark.spark
    spark.sql("CREATE FUNCTION jar_mul(BIGINT, BIGINT) RETURNS BIGINT " +
      s"LANGUAGE CLASS AS 'jartest.JarMul' USING JAR '$jarPath'")
    assert(spark.sql(
      "SELECT jar_mul(CAST(6 AS BIGINT), CAST(7 AS BIGINT)) AS v")
      .head().getLong(0) == 42L)
  }

  test("USING JAR works for AGGREGATE and TABLE function variants too") {
    val spark = TestSpark.spark
    import spark.implicits._
    val aggJar = buildJar("jartest.JarSum",
      """package jartest;
        |import graft.adhesive.AdhesiveAggregate;
        |import org.apache.spark.sql.Row;
        |public class JarSum extends AdhesiveAggregate {
        |  public Object zero() { return 0L; }
        |  public Object reduce(Object s, Row i) {
        |    return i.isNullAt(0) ? s : (Long) s + i.getLong(0);
        |  }
        |  public Object merge(Object a, Object b) { return (Long) a + (Long) b; }
        |}
        |""".stripMargin)
    spark.sql("CREATE AGGREGATE FUNCTION jar_sum(BIGINT) RETURNS BIGINT " +
      s"LANGUAGE CLASS AS 'jartest.JarSum' USING JAR '$aggJar'")
    Seq(1L, 2L, 39L).toDF("x").createOrReplaceTempView("t_jar_agg")
    assert(spark.sql("SELECT jar_sum(x) AS s FROM t_jar_agg")
      .head().getLong(0) == 42L)

    val tfJar = buildJar("jartest.JarPair",
      """package jartest;
        |import graft.adhesive.AdhesiveTableFunction;
        |import org.apache.spark.sql.Row;
        |import org.apache.spark.sql.RowFactory;
        |import java.util.*;
        |public class JarPair extends AdhesiveTableFunction {
        |  public List<Row> eval(Row a) {
        |    long v = a.getLong(0);
        |    return Arrays.asList(RowFactory.create(v), RowFactory.create(-v));
        |  }
        |}
        |""".stripMargin)
    spark.sql("CREATE TABLE FUNCTION jar_pair(BIGINT) RETURNS TABLE(v BIGINT) " +
      s"LANGUAGE CLASS AS 'jartest.JarPair' USING JAR '$tfJar'")
    val rows = spark.sql(
      "SELECT v FROM jar_pair(CAST(7 AS BIGINT)) ORDER BY v")
      .collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(-7L, 7L))
  }

  test("USING JAR parses with a quoted-escape path and only with LANGUAGE CLASS") {
    val stmt = AdhesiveDdl.parse("CREATE FUNCTION f(BIGINT) RETURNS BIGINT " +
      "LANGUAGE CLASS AS 'a.B' USING JAR '/tmp/it''s.jar'").get
    assert(stmt.jarPath.contains("/tmp/it's.jar"))
    val e = intercept[AdhesiveException] {
      AdhesiveDdl.parse("CREATE FUNCTION f(BIGINT) RETURNS BIGINT " +
        "LANGUAGE JAVA AS 'class X {}' USING JAR '/tmp/x.jar'")
    }
    assert(e.getMessage.contains("LANGUAGE CLASS"))
  }

  test("a wrong class name inside the jar fails at DDL time with the jar in the message") {
    val e = intercept[AdhesiveException] {
      TestSpark.spark.sql("CREATE FUNCTION jar_missing(BIGINT) RETURNS BIGINT " +
        s"LANGUAGE CLASS AS 'jartest.NoSuch' USING JAR '$jarPath'")
    }
    assert(e.getMessage.contains("jartest.NoSuch") && e.getMessage.contains(jarPath))
  }

  test("replacing the jar at the same path serves the new class, not stale cache") {
    val spark = TestSpark.spark
    val cls = "jartest.Versioned"
    def versionSource(delta: Long): String =
      s"""package jartest;
         |import graft.adhesive.Adhesive;
         |import org.apache.spark.sql.Row;
         |public class Versioned extends Adhesive {
         |  public Object compute(Row row) { return row.getLong(0) + ${delta}L; }
         |}
         |""".stripMargin
    // v1 at a fixed path
    val path = buildJar(cls, versionSource(1L))
    spark.sql("CREATE OR REPLACE FUNCTION jar_ver(BIGINT) RETURNS BIGINT " +
      s"LANGUAGE CLASS AS '$cls' USING JAR '$path'")
    assert(spark.sql("SELECT jar_ver(CAST(10 AS BIGINT)) AS v")
      .head().getLong(0) == 11L)
    // overwrite the SAME path with v2 (different behavior), force a
    // distinct mtime in case the filesystem clock is coarse
    val v2 = buildJar(cls, versionSource(2L))
    java.nio.file.Files.move(java.nio.file.Paths.get(v2),
      java.nio.file.Paths.get(path),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val f = new java.io.File(path)
    assert(f.setLastModified(f.lastModified() + 2000))
    spark.sql("CREATE OR REPLACE FUNCTION jar_ver(BIGINT) RETURNS BIGINT " +
      s"LANGUAGE CLASS AS '$cls' USING JAR '$path'")
    assert(spark.sql("SELECT jar_ver(CAST(10 AS BIGINT)) AS v")
      .head().getLong(0) == 12L,
      "re-registration after a jar swap must load the replaced class")
  }

  test("plain LANGUAGE CLASS (no USING JAR) still resolves the launch classpath") {
    val spark = TestSpark.spark
    spark.sql("CREATE OR REPLACE FUNCTION cp_add(BIGINT, BIGINT) RETURNS BIGINT " +
      "LANGUAGE CLASS AS 'graft.adhesive.example.BasicAddExample'")
    assert(spark.sql(
      "SELECT cp_add(CAST(40 AS BIGINT), CAST(2 AS BIGINT)) AS v")
      .head().getLong(0) == 42L)
  }
}
