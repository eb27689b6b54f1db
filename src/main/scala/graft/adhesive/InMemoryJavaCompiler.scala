package graft.adhesive

import java.io.ByteArrayOutputStream
import java.net.URI
import javax.tools.JavaFileObject.Kind
import javax.tools.{
  DiagnosticCollector, FileObject, ForwardingJavaFileManager, JavaFileManager,
  JavaFileObject, SimpleJavaFileObject, ToolProvider
}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** In-memory `javac` compilation of a single source string to bytecode,
  * DDL-time, driver-side. Functional counterpart of the reference's
  * `Compiler` (`/root/reference/java/src/main/java/.../Compiler.java:34-59`:
  * system compiler + in-memory file manager + map-backed classloader), but
  * returns the bytecode map instead of loading classes immediately — the
  * bytes must travel to executors inside the UDF closure (the distribution
  * problem the reference never faced, SURVEY §7.4 H1).
  */
object InMemoryJavaCompiler {

  /** Compile `source` (which must declare class `fqn`). Returns a map of
    * binary class name → bytecode for every emitted class (the declared
    * class plus any nested/anonymous classes).
    *
    * @throws AdhesiveCompileException on any diagnostic error, message
    *         prefixed "Can't compile function" for parity with the
    *         reference (`Compiler.java:46-51`, asserted by
    *         `CompilerTest.java:33-45`).
    */
  def compile(fqn: String, source: String): Map[String, Array[Byte]] = {
    val compiler = ToolProvider.getSystemJavaCompiler
    if (compiler == null) {
      throw new AdhesiveCompileException(
        "Can't compile function: no system Java compiler (JRE instead of JDK?)")
    }
    val diagnostics = new DiagnosticCollector[JavaFileObject]
    val stdFm = compiler.getStandardFileManager(diagnostics, null, null)
    val out = mutable.Map.empty[String, ByteArrayOutputStream]

    val fm = new ForwardingJavaFileManager[JavaFileManager](stdFm) {
      override def getJavaFileForOutput(
          location: JavaFileManager.Location, className: String,
          kind: Kind, sibling: FileObject): JavaFileObject = {
        val buf = new ByteArrayOutputStream()
        out(className) = buf
        new SimpleJavaFileObject(
            URI.create(s"mem:///${className.replace('.', '/')}.class"), kind) {
          override def openOutputStream() = buf
        }
      }
    }

    val src = new SimpleJavaFileObject(
        URI.create(s"string:///${fqn.replace('.', '/')}.java"), Kind.SOURCE) {
      override def getCharContent(ignoreEncodingErrors: Boolean): CharSequence =
        source
    }

    // The forked JVM's java.class.path carries the Spark jars and this
    // library's classes, so user source can extend graft.adhesive.Adhesive
    // and import org.apache.spark.sql.Row.
    val options = List("-classpath", System.getProperty("java.class.path"))
    // try/finally: a throwing getTask/call must still close both managers
    // (the standard one holds classpath file handles) — repeated failing
    // DDL on a long-lived driver would otherwise leak them
    val ok =
      try compiler.getTask(null, fm, diagnostics, options.asJava, null,
        List(src).asJava).call()
      finally {
        fm.close()
        stdFm.close()
      }

    if (!ok) {
      val msgs = diagnostics.getDiagnostics.asScala.map(_.toString).mkString("\n")
      throw new AdhesiveCompileException(s"Can't compile function:\n$msgs")
    }
    val classes = out.view.mapValues(_.toByteArray).toMap
    if (!classes.contains(fqn)) {
      throw new AdhesiveCompileException(
        s"Can't compile function: compilation produced no class named $fqn " +
          s"(got: ${classes.keys.mkString(", ")})")
    }
    classes
  }
}
