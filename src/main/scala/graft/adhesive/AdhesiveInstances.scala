package graft.adhesive

import java.util.concurrent.ConcurrentHashMap

/** Classloader over an in-memory bytecode map (the executor-side half of
  * runtime compilation). Parent-first for everything not in the map, so user
  * classes resolve Spark/this-library types normally.
  */
class BytecodeClassLoader(bytecode: Map[String, Array[Byte]], parent: ClassLoader)
    extends ClassLoader(parent) {
  override def findClass(name: String): Class[_] =
    bytecode.get(name) match {
      case Some(bytes) => defineClass(name, bytes, 0, bytes.length)
      case None        => throw new ClassNotFoundException(name)
    }
}

/** Per-JVM cache of instantiated user functions: one instance per
  * fully-qualified class name, created via the no-arg constructor on first
  * use and reused across all rows, batches, and tasks in that JVM. This
  * mirrors the reference's deliberate design — default-ctor instantiation
  * (`/root/reference/src/jvm.rs:84-93`) pinned with a JNI global ref reused
  * across invocations (`src/jvm.rs:93-102`).
  *
  * Because every `LANGUAGE JAVA` registration gets a fresh random package
  * ([[SourceRewriter]]), the FQN key is unique per registration, so a
  * re-registered function never picks up a stale cached instance. Classes
  * are never unloaded (the reference inherits the same leak —
  * `Compiler.java:22` "add class unloading at some point").
  */
object AdhesiveInstances {

  // One cache for both user base classes (scalar Adhesive and
  // AdhesiveAggregate): FQNs are unique per registration (random package),
  // so a key can never resolve to different base types.
  private val cache = new ConcurrentHashMap[String, AnyRef]()
  private val jarLoaders = new ConcurrentHashMap[String, ClassLoader]()

  /** Get-or-create the singleton instance of `fqn`. An empty `bytecode` map
    * means a classpath class (`LANGUAGE CLASS` path — reference
    * `src/jvm.rs:63-109`); a non-empty map means runtime-compiled source
    * shipped from the driver.
    *
    * Performs the `instanceof Adhesive` check the reference left as a TODO
    * (`src/jvm.rs:78-81`).
    */
  /** Cache key for a jar-loaded class: the path plus the jar's length and
    * mtime, so `CREATE OR REPLACE` after swapping the jar file at the same
    * path gets a fresh loader and a fresh instance instead of silently
    * serving stale classes. Loaders for superseded versions are kept (not
    * closed) — in-flight tasks may still hold their classes; the same
    * never-unload contract as runtime-compiled bytecode.
    */
  private def jarVersionKey(path: String): String = {
    val f = new java.io.File(path)
    s"$path:${f.length}:${f.lastModified}"
  }

  def instance(fqn: String, bytecode: Map[String, Array[Byte]],
      jarPath: Option[String] = None): Adhesive =
    instanceAs(classOf[Adhesive], fqn, bytecode, jarPath)

  /** The aggregate twin: same loading/caching/error pipeline, checked
    * against [[AdhesiveAggregate]] instead.
    */
  def aggregateInstance(fqn: String, bytecode: Map[String, Array[Byte]],
      jarPath: Option[String] = None): AdhesiveAggregate =
    instanceAs(classOf[AdhesiveAggregate], fqn, bytecode, jarPath)

  /** The table-function twin ([[AdhesiveTableFunction]]). */
  def tableInstance(fqn: String, bytecode: Map[String, Array[Byte]],
      jarPath: Option[String] = None): AdhesiveTableFunction =
    instanceAs(classOf[AdhesiveTableFunction], fqn, bytecode, jarPath)

  private def instanceAs[T <: AnyRef](base: Class[T], fqn: String,
      bytecode: Map[String, Array[Byte]],
      jarPath: Option[String]): T = {
    val inst = cache.computeIfAbsent(
      jarPath.fold(fqn)(p => s"$fqn@${jarVersionKey(p)}"), { _ =>
      val parent = Option(Thread.currentThread().getContextClassLoader)
        .getOrElse(classOf[Adhesive].getClassLoader)
      val cls =
        if (jarPath.isDefined) {
          // `LANGUAGE CLASS ... USING JAR` — the reference's new_with_jar
          // boot path (src/jvm.rs:44-61), resolved lazily per JVM instead
          // of at JVM boot. One URLClassLoader per jar version
          // (parent-first, so the jar's classes see Adhesive itself from
          // the host classpath); the version-stamped key means a replaced
          // jar at the same path is re-resolved rather than served stale.
          // The path must resolve wherever the task runs — in a cluster
          // deployment that means shared storage or spark.jars staging,
          // same operational contract as the reference's boot-classpath
          // jar.
          val url = new java.io.File(jarPath.get).toURI.toURL
          val loader = jarLoaders.computeIfAbsent(jarVersionKey(jarPath.get),
            _ => new java.net.URLClassLoader(Array(url), parent))
          try Class.forName(fqn, true, loader)
          catch {
            case e: ClassNotFoundException =>
              throw new AdhesiveException(
                s"class '$fqn' not found in jar '${jarPath.get}'", e)
          }
        } else if (bytecode.isEmpty) {
          try Class.forName(fqn, true, parent)
          catch {
            case e: ClassNotFoundException =>
              throw new AdhesiveException(s"class '$fqn' not found on the classpath", e)
          }
        } else {
          new BytecodeClassLoader(bytecode, parent).loadClass(fqn)
        }
      if (!base.isAssignableFrom(cls)) {
        throw new AdhesiveException(
          s"class '$fqn' does not extend ${base.getName}")
      }
      try {
        val ctor = cls.getDeclaredConstructor()
        // Users writing `class F extends Adhesive` (no `public`) inside a
        // LANGUAGE JAVA body get a package-private class in the generated
        // package; without this, reflection rejects it with
        // IllegalAccessException. (The reference fails the same way —
        // Compiler.java:57 newInstance() — we accept both forms.)
        ctor.setAccessible(true)
        ctor.newInstance().asInstanceOf[AnyRef]
      } catch {
        case e: NoSuchMethodException =>
          throw new AdhesiveException(
            s"class '$fqn' has no public no-arg constructor", e)
        // a throwing user constructor, static initializer, or a JPMS
        // setAccessible refusal must surface as an adhesive error WITH
        // the class name and the real message — not a bare
        // InvocationTargetException whose getMessage is null
        case e: java.lang.reflect.InvocationTargetException =>
          val cause = Option(e.getCause).getOrElse(e)
          throw new AdhesiveException(
            s"constructor of '$fqn' threw: $cause", cause)
        case e: ExceptionInInitializerError =>
          val cause = Option(e.getCause).getOrElse(e)
          throw new AdhesiveException(
            s"static initializer of '$fqn' threw: $cause", cause)
        case e: ReflectiveOperationException =>
          throw new AdhesiveException(
            s"cannot instantiate '$fqn': $e", e)
        case e: RuntimeException if e.getClass.getName ==
            "java.lang.reflect.InaccessibleObjectException" =>
          throw new AdhesiveException(
            s"cannot access constructor of '$fqn' (module not opened): $e", e)
      }
    })
    // The base check must ALSO run on cache hits: a classpath class (stable
    // FQN, unlike the random-package runtime-compiled ones) may already be
    // cached under a DIFFERENT user base — e.g. registered as a scalar
    // Adhesive, then requested as an AdhesiveTableFunction. The erased
    // asInstanceOf alone would hand back the wrong type silently.
    if (!base.isInstance(inst)) {
      throw new AdhesiveException(
        s"class '$fqn' does not extend ${base.getName}")
    }
    inst.asInstanceOf[T]
  }
}
