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

  test("plain LANGUAGE CLASS (no USING JAR) still resolves the launch classpath") {
    val spark = TestSpark.spark
    spark.sql("CREATE OR REPLACE FUNCTION cp_add(BIGINT, BIGINT) RETURNS BIGINT " +
      "LANGUAGE CLASS AS 'graft.adhesive.example.BasicAddExample'")
    assert(spark.sql(
      "SELECT cp_add(CAST(40 AS BIGINT), CAST(2 AS BIGINT)) AS v")
      .head().getLong(0) == 42L)
  }
}
