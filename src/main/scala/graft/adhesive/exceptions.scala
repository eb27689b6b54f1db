package graft.adhesive

/** Error taxonomy mirroring the reference's `JvmFunctionError`
  * (`/root/reference/src/lib.rs:11-25`), minus the JNI-specific variants
  * that have no analogue inside a single JVM.
  */
class AdhesiveException(message: String, cause: Throwable = null)
    extends RuntimeException(message, cause)

/** DDL-time compilation failure. Carries javac diagnostics in the message
  * (improves on the reference, which logs them and throws a bare
  * "Can't compile function" — `Compiler.java:46-51`).
  */
class AdhesiveCompileException(message: String)
    extends AdhesiveException(message)

/** Runtime failure inside a user `compute`, wrapped with the function name
  * (the reference loses the Java exception message — `src/jvm.rs:151-153`;
  * SURVEY §2a#9 says to do better).
  */
class AdhesiveExecutionException(message: String, cause: Throwable)
    extends AdhesiveException(message, cause)
