package graft.adhesive

import graft.TestSpark
import graft.functions.RollingHash
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import org.scalacheck.{Gen, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5 rebuild test plan): engine results over
  * generated inputs, and algebraic laws of the hash primitives.
  */
class AdhesivePropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def passes(p: org.scalacheck.Prop, trials: Int = 15): Unit = {
    val res = check(Parameters.default.withMinSuccessfulTests(trials), p)
    assert(res.passed, res.status.toString)
  }

  test("property: registered multiply equals Scala multiply over random longs") {
    AdhesiveDdl.execute(spark,
      """CREATE OR REPLACE FUNCTION prop_mul(BIGINT, BIGINT) RETURNS BIGINT AS $$
        |import graft.adhesive.Adhesive;
        |import org.apache.spark.sql.Row;
        |public class PropMul extends Adhesive {
        |  public Object compute(Row row) { return row.getLong(0) * row.getLong(1); }
        |}
        |$$""".stripMargin)
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.long, Gen.long))
    passes(forAll(gen) { pairs =>
      pairs.toDF("a", "b").createOrReplaceTempView("prop_t")
      val got = spark.sql("SELECT a, b, prop_mul(a, b) AS p FROM prop_t")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      got.forall { case (a, b, p) => p == a * b }
    })
  }

  test("property: null-in propagates through a null-checking compute") {
    AdhesiveDdl.execute(spark,
      """CREATE OR REPLACE FUNCTION prop_nullsafe(BIGINT) RETURNS BIGINT AS $$
        |import graft.adhesive.Adhesive;
        |import org.apache.spark.sql.Row;
        |public class PropNull extends Adhesive {
        |  public Object compute(Row row) {
        |    if (row.isNullAt(0)) return null;
        |    return row.getLong(0) + 1;
        |  }
        |}
        |$$""".stripMargin)
    val gen = Gen.nonEmptyListOf(Gen.option(Gen.long))
    passes(forAll(gen) { xs =>
      xs.toDF("a").createOrReplaceTempView("prop_n")
      val got = spark.sql("SELECT a, prop_nullsafe(a) AS v FROM prop_n")
        .collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1))))
      got.forall { case (in, out) => out == in.map(_ + 1) }
    })
  }

  test("property: parseType round-trips every renderable DataType tree") {
    import org.apache.spark.sql.types._
    // generator over the declared-type lattice: scalars, DECIMAL(p,s),
    // ARRAY<T>, MAP<K,V>, STRUCT<name: T, ...> with bounded depth
    val scalarGen: Gen[DataType] = Gen.oneOf(
      LongType, IntegerType, ShortType, ByteType, FloatType, DoubleType,
      StringType, BooleanType, DateType, TimestampType, BinaryType)
    val decimalGen: Gen[DataType] = for {
      p <- Gen.choose(1, 38); s <- Gen.choose(0, p)
    } yield DecimalType(p, s)
    def typeGen(depth: Int): Gen[DataType] =
      if (depth == 0) Gen.oneOf(scalarGen, decimalGen)
      else Gen.frequency(
        4 -> scalarGen,
        2 -> decimalGen,
        2 -> typeGen(depth - 1).map(ArrayType(_)),
        1 -> Gen.zip(typeGen(0), typeGen(depth - 1)).map {
          case (k, v) => MapType(k, v)
        },
        1 -> (for {
          n <- Gen.choose(1, 3)
          fields <- Gen.listOfN(n, typeGen(depth - 1))
        } yield StructType(fields.zipWithIndex.map {
          case (t, i) => StructField(s"f$i", t)
        })))
    // render a DataType as the DDL grammar's surface syntax
    def render(dt: DataType): String = dt match {
      case LongType            => "BIGINT"
      case IntegerType         => "INT"
      case ShortType           => "SMALLINT"
      case ByteType            => "TINYINT"
      case FloatType           => "FLOAT"
      case DoubleType          => "DOUBLE"
      case StringType          => "STRING"
      case BooleanType         => "BOOLEAN"
      case DateType            => "DATE"
      case TimestampType       => "TIMESTAMP"
      case BinaryType          => "BINARY"
      case d: DecimalType      => s"DECIMAL(${d.precision},${d.scale})"
      case ArrayType(e, _)     => s"ARRAY<${render(e)}>"
      case MapType(k, v, _)    => s"MAP<${render(k)}, ${render(v)}>"
      case StructType(fs)      =>
        fs.map(f => s"${f.name}: ${render(f.dataType)}")
          .mkString("STRUCT<", ", ", ">")
      case other => fail(s"unrenderable $other")
    }
    // structural equality modulo nullability flags (the signature carries
    // none — StrictArg's lattice)
    def same(a: DataType, b: DataType): Boolean = (a, b) match {
      case (ArrayType(x, _), ArrayType(y, _)) => same(x, y)
      case (MapType(ka, va, _), MapType(kb, vb, _)) =>
        same(ka, kb) && same(va, vb)
      case (StructType(fa), StructType(fb)) =>
        fa.length == fb.length && fa.zip(fb).forall { case (x, y) =>
          x.name == y.name && same(x.dataType, y.dataType)
        }
      case _ => a == b
    }
    passes(forAll(typeGen(3)) { dt =>
      same(AdhesiveDdl.parseType(render(dt)), dt)
    }, trials = 200)
  }

  test("property: rolling hash obeys the concatenation law") {
    // h(a ++ b) = h(a)·B^|b| + h(b)  (mod 2^61−1)
    def powMod(base: Long, e: Int): Long =
      (0 until e).foldLeft(1L)((acc, _) => RollingHash.mulMod(acc, base))
    passes(forAll { (a: String, b: String) =>
      val bBytes = b.getBytes("UTF-8").length
      val expected = (RollingHash.mulMod(
        RollingHash.hashBytes(a.getBytes("UTF-8")),
        powMod(RollingHash.Base, bBytes)) +
        RollingHash.hashBytes(b.getBytes("UTF-8"))) % RollingHash.Mod
      RollingHash.hashBytes((a + b).getBytes("UTF-8")) == expected
    }, trials = 100)
  }
}
