package graft.adhesive

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the compile seam, mirroring the reference's
  * `CompilerTest.java:22-45` (success + "Can't compile function" failure)
  * and `src/util.rs` mangling behavior.
  */
class CompilerSpec extends AnyFunSuite {

  val validSource =
    """import graft.adhesive.Adhesive;
      |import org.apache.spark.sql.Row;
      |public class Doubler extends Adhesive {
      |  public Object compute(Row row) { return row.getLong(0) * 2; }
      |}""".stripMargin

  test("rewrite prepends a unique generated package and derives the FQN") {
    val (src1, fqn1) = SourceRewriter.rewrite(validSource)
    val (_, fqn2) = SourceRewriter.rewrite(validSource)
    assert(fqn1.startsWith(SourceRewriter.GeneratedPackagePrefix))
    assert(fqn1.endsWith(".Doubler"))
    assert(fqn1 != fqn2, "each registration must get a fresh package")
    assert(src1.startsWith("package "))
  }

  test("compile + instantiate + compute round-trip") {
    val (src, fqn) = SourceRewriter.rewrite(validSource)
    val bytecode = InMemoryJavaCompiler.compile(fqn, src)
    assert(bytecode.contains(fqn))
    val inst = AdhesiveInstances.instance(fqn, bytecode)
    assert(inst.compute(Row(21L)) == 42L)
  }

  test("instance is cached per FQN (reference global-ref parity)") {
    val (src, fqn) = SourceRewriter.rewrite(validSource)
    val bytecode = InMemoryJavaCompiler.compile(fqn, src)
    val a = AdhesiveInstances.instance(fqn, bytecode)
    val b = AdhesiveInstances.instance(fqn, bytecode)
    assert(a eq b)
  }

  test("compile failure raises 'Can't compile function' with diagnostics") {
    val bad = "public class Broken extends NothingThatExists {}"
    val (src, fqn) = SourceRewriter.rewrite(bad)
    val e = intercept[AdhesiveCompileException] {
      InMemoryJavaCompiler.compile(fqn, src)
    }
    assert(e.getMessage.contains("Can't compile function"))
    assert(e.getMessage.contains("NothingThatExists"))
  }

  test("source without a class declaration is rejected") {
    val e = intercept[AdhesiveCompileException] {
      SourceRewriter.rewrite("int x = 1;")
    }
    assert(e.getMessage.contains("Can't compile function"))
  }
}
