package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string's UTF-8 bytes — the incremental
  * content-fingerprint primitive (Rabin-Karp family) used for
  * content-defined chunking and cheap document fingerprints at scale. A
  * native Catalyst expression with codegen: one pass over the bytes inside
  * the generated stage, no UDF boxing, no regex.
  *
  * h = Σ b_i · B^(n-1-i) mod 2^61-1, with B = 257. Deterministic across
  * JVMs and partitions (pure function of the bytes).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects STRING, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    RollingHash.hashBytes(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Mod: Long = (1L << 61) - 1
  final val Base: Long = 257L

  /** Modular-multiply two values < 2^61-1 without overflow (128-bit via
    * Math.multiplyHigh, then Mersenne reduction).
    */
  def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // (hi, lo) = a*b as 128-bit; reduce mod 2^61-1: value = hi*2^64 + lo
    // 2^64 ≡ 8 (mod 2^61-1) since 2^61 ≡ 1
    var r = (lo & Mod) + (lo >>> 61) + ((hi << 3) & Mod) + (hi >>> 58)
    while (r >= Mod) r -= Mod
    r
  }

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = mulMod(h, Base) + (bytes(i) & 0xffL)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
}
