package graft.adhesive

import scala.util.Random

/** Rewrites user-supplied Java source before compilation: extracts the class
  * name and prepends a random, per-registration package declaration so that
  * re-registering a function with the same class name never collides in the
  * (never-unloaded) classloader world.
  *
  * Semantics mirror the reference's `update_java_code`
  * (`/root/reference/src/util.rs:24-36`): class-name extraction via the
  * regex `class\s+(\w+)` (`src/util.rs:14`) and a random 6-lowercase-letter
  * package suffix (`src/util.rs:7-11`). Like the reference, source that
  * already carries a `package` declaration is not supported for
  * `LANGUAGE JAVA` bodies (use `LANGUAGE CLASS` for pre-packaged classes).
  */
object SourceRewriter {

  // \b: without the boundary, prose like "// subclass of Adhesive" above
  // the real declaration extracts 'of' from 'subclass of' and javac fails
  // with a baffling filename/class mismatch instead of compiling F
  private val ClassName = """\bclass\s+(\w+)""".r

  private[adhesive] val GeneratedPackagePrefix = "graft.adhesive.generated.p"

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** Random package name, collision-free: the random part mirrors the
    * reference's 6-letter suffix, and the appended process-wide counter
    * makes the FQN unique even on a birthday collision (26^6 ≈ 3.1e8 —
    * a repeat would silently reuse the previously cached instance for a
    * CREATE OR REPLACE with a different body).
    */
  def randomPackage(): String = {
    val suffix = Iterator.continually(Random.nextInt(26)).take(6)
      .map(i => ('a' + i).toChar).mkString
    GeneratedPackagePrefix + suffix + seq.incrementAndGet()
  }

  /** @return (rewritten source with package declaration prepended,
    *         fully-qualified class name)
    */
  def rewrite(source: String): (String, String) = {
    val name = ClassName.findFirstMatchIn(source).map(_.group(1)).getOrElse {
      throw new AdhesiveCompileException(
        "Can't compile function: no `class <Name>` found in function body")
    }
    val pkg = randomPackage()
    (s"package $pkg;\n$source", s"$pkg.$name")
  }
}
