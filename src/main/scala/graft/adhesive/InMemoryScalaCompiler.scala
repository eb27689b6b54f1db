package graft.adhesive

import scala.reflect.internal.util.BatchSourceFile
import scala.reflect.io.{AbstractFile, VirtualDirectory}
import scala.tools.nsc.reporters.StoreReporter
import scala.tools.nsc.{Global, Settings}

/** In-memory compilation of a Scala source string to bytecode — the
  * `LANGUAGE SCALA` counterpart of [[InMemoryJavaCompiler]] (an extension
  * beyond the reference, which compiles only Java; natural here since the
  * host engine is Scala). Output goes to a virtual directory and is
  * collected into the same bytecode-map form the executor-side
  * [[BytecodeClassLoader]] consumes.
  */
object InMemoryScalaCompiler {

  def compile(fqn: String, source: String): Map[String, Array[Byte]] = {
    val settings = new Settings()
    settings.usejavacp.value = true // forked JVM: java.class.path has Spark + this library
    val out = new VirtualDirectory("(memory)", None)
    settings.outputDirs.setSingleOutput(out)
    val reporter = new StoreReporter(settings)
    val global = new Global(settings, reporter)
    val run = new global.Run
    run.compileSources(List(new BatchSourceFile("<adhesive>", source)))
    if (reporter.hasErrors) {
      val msgs = reporter.infos.filter(_.severity == reporter.ERROR)
        .map(i => s"${i.pos.line}: ${i.msg}").mkString("\n")
      throw new AdhesiveCompileException(s"Can't compile function:\n$msgs")
    }
    val classes = collect(out, "")
    if (!classes.contains(fqn)) {
      throw new AdhesiveCompileException(
        s"Can't compile function: compilation produced no class named $fqn " +
          s"(got: ${classes.keys.mkString(", ")})")
    }
    classes
  }

  private def collect(dir: AbstractFile, prefix: String): Map[String, Array[Byte]] =
    dir.iterator.flatMap { f =>
      if (f.isDirectory) collect(f, s"$prefix${f.name}.")
      else if (f.name.endsWith(".class"))
        Map(s"$prefix${f.name.stripSuffix(".class")}" -> f.toByteArray)
      else Map.empty[String, Array[Byte]]
    }.toMap
}
