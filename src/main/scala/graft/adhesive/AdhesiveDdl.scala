package graft.adhesive

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** The `CREATE FUNCTION` DDL surface (grammar per the reference's README
  * examples, `/root/reference/README.md:19-40`, and its statement handling,
  * `src/fusion.rs:28-58`):
  *
  * {{{
  * CREATE [OR REPLACE] FUNCTION name(TYPE, ...) RETURNS TYPE [NOT NULL]
  *   [DETERMINISTIC] [LANGUAGE JAVA|CLASS]   -- flags accepted in either order
  *   AS '<java source | fully.qualified.ClassName>'
  *   [USING JAR '<path>']
  *
  * CREATE [OR REPLACE] AGGREGATE FUNCTION name(TYPE, ...) RETURNS TYPE
  *   [STATE TYPE]                  -- partial-aggregation buffer type,
  *                                 --   defaults to the RETURNS type
  *   [DETERMINISTIC]               -- like scalar: absent = volatile
  *   [LANGUAGE JAVA|SCALA|CLASS]
  *   AS '<source extending AdhesiveAggregate | fully.qualified.ClassName>'
  *   [USING JAR '<path>']
  *
  * CREATE [OR REPLACE] TABLE FUNCTION name(TYPE, ...)
  *   RETURNS TABLE(col TYPE, ...)  -- output row schema
  *   [LANGUAGE JAVA|SCALA|CLASS]
  *   AS '<source extending AdhesiveTableFunction | fully.qualified.ClassName>'
  *   [USING JAR '<path>']
  * }}}
  *
  * Semantics:
  *   - language defaults to JAVA when omitted (`src/fusion.rs:31-35`);
  *   - a missing body is the reference's "class name or class definition
  *     should be provided" error (`src/fusion.rs:57`);
  *   - `''` inside the quoted body unescapes to `'` (standard SQL string
  *     literal rules, as DataFusion's parser applies to the body literal);
  *   - `RETURNS <type> NOT NULL` is the SQL surface of the reference's
  *     `computeNonNull*` fast path (`java/.../Adhesive.java:105-124`):
  *     the result column is declared non-nullable so Catalyst elides
  *     null checks, and a NULL actually returned at runtime fails the
  *     query (the reference NPEs unboxing the null; here it is a kept
  *     AdhesiveExecutionException message);
  *   - plain `CREATE FUNCTION` (without OR REPLACE) REPLACES an existing
  *     function of the same name, matching the reference: DataFusion's
  *     FunctionFactory registration also overwrites (intentional parity,
  *     not an oversight — standard-SQL already-exists semantics would
  *     diverge from the system being rebuilt);
  *   - `USING JAR '<path>'` (LANGUAGE CLASS only) resolves the class
  *     from that jar via a cached URLClassLoader — the lazy per-session
  *     form of the reference's `new_with_jar` boot-classpath jar
  *     (`src/jvm.rs:44-61`);
  *   - argument types include the parameterized forms `DECIMAL(p,s)`
  *     (read as `java.math.BigDecimal` via `row.getDecimal(i)`),
  *     `ARRAY<T>` (read via `row.getList(i)`), `MAP<K,V>` (read via
  *     `row.getJavaMap(i)`) and `STRUCT<name: TYPE, ...>` (read via
  *     `row.getStruct(i)`, positional exactness on field types) — types
  *     the reference's Row getters would permit but its grammar never
  *     produced (`src/fusion.rs:83-91`).
  */
object AdhesiveDdl {

  sealed trait Language
  case object LangJava extends Language
  case object LangClass extends Language
  case object LangScala extends Language

  /** The three UDF variants on this seam (the reference constructs only
    * the scalar one — `RegisterFunction::Scalar`, `src/fusion.rs:78`).
    */
  sealed trait FunctionKind
  case object KindScalar extends FunctionKind
  case object KindAggregate extends FunctionKind
  case object KindTable extends FunctionKind

  case class CreateFunctionStatement(
      name: String,
      argTypes: Seq[DataType],
      returnType: DataType, // for KindTable: a placeholder; see tableSchema
      language: Language,
      body: String,
      deterministic: Boolean = false,
      nonNullable: Boolean = false,
      jarPath: Option[String] = None,
      kind: FunctionKind = KindScalar,
      stateType: Option[DataType] = None,
      tableSchema: Option[StructType] = None)

  // Three body forms: '…' (SQL '' escaping), "…" (the reference README's
  // LANGUAGE CLASS example quotes the class name this way, README.md:36-40),
  // and $$…$$ dollar-quoting (raw, no escapes — the form the reference
  // intended but left broken, src/fusion.rs:52-56).
  // NOT NULL / DETERMINISTIC are one repeated alternation, so either
  // clause order parses — a fixed order would silently fall through to
  // Spark's parser and a baffling unrelated ParseException
  // Args capture is lazy (.*?) rather than [^)]* so parameterized types —
  // DECIMAL(12,2) — can nest parens inside the argument list; the regex
  // engine backtracks to the ')' that is actually followed by RETURNS.
  // The RETURNS type likewise admits one optional (...) or <...> suffix so
  // DECIMAL(p,s)/ARRAY<T> reach parseType (and its clear "not supported"
  // error for non-return-matrix types) instead of falling through to
  // Spark's parser.
  // One paren-nesting level inside the optional (...) suffix, so
  // TABLE(price DECIMAL(12,2), ...) tokenizes as one type. Angle nesting
  // is generated to a fixed depth (regexes can't express unbounded
  // nesting): depth 4 admits e.g. ARRAY<MAP<STRING, ARRAY<ARRAY<T>>>> in
  // RETURNS/STATE position — deeper types still work as ARGUMENTS (the
  // arg list is captured lazily and split by splitTopLevel, which counts
  // depth exactly).
  private def angles(depth: Int): String =
    if (depth == 0) "<[^<>]*>" else s"<(?:[^<>]|${angles(depth - 1)})*>"
  private val TypeToken =
    s"""\\w+(?:\\s*\\((?:[^()]|\\([^)]*\\))*\\)|\\s*${angles(4)})?"""
  // Flags admit NOT NULL / DETERMINISTIC / STATE <type> in any order; the
  // STATE type (aggregates only: the partial-aggregation buffer type,
  // defaulting to the RETURNS type) is re-extracted from the captured flags
  // text by StateClause below.
  private val FlagsToken =
    s"""(?:NOT\\s+NULL\\s+|DETERMINISTIC\\s+|STATE\\s+$TypeToken\\s+)*"""
  private val Prefix =
    s"""(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?((?:AGGREGATE|TABLE)\\s+)?FUNCTION\\s+(\\w+)\\s*\\((.*?)\\)\\s*RETURNS\\s+($TypeToken)\\s*($FlagsToken)(?:LANGUAGE\\s+(\\w+)\\s*)?AS\\s+"""
  private val JarTail = """(?:\s+USING\s+JAR\s+'((?:[^']|'')*)')?\s*;?\s*$"""
  private val WithBodySingle = (Prefix + """'((?:[^']|'')*)'""" + JarTail).r
  private val WithBodyDouble = (Prefix + """"((?:[^"]|"")*)"""" + JarTail).r
  private val WithBodyDollar = (Prefix + """\$\$(.*?)\$\$""" + JarTail).r

  private val WithoutBody =
    s"""(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?(?:(?:AGGREGATE|TABLE)\\s+)?FUNCTION\\s+(\\w+)\\s*\\((.*?)\\)\\s*RETURNS\\s+(?:$TypeToken)\\s*(?:NOT\\s+NULL\\s*|DETERMINISTIC\\s*|STATE\\s+$TypeToken\\s*)*(?:LANGUAGE\\s+(\\w+))?\\s*;?\\s*$$""".r

  /** Try to parse `sqlText` as adhesive DDL. Returns None when the text is
    * not a `CREATE FUNCTION ... RETURNS ...` statement at all (so Spark's own
    * parser — including its native `CREATE FUNCTION ... AS 'fqn' USING JAR`,
    * which has no RETURNS clause — still sees it).
    */
  def parse(sqlText: String): Option[CreateFunctionStatement] = sqlText match {
    case WithBodyDollar(agg, name, args, ret, flags, lang, body, jar) =>
      Some(statement(agg, name, args, ret, flags, lang, body, jar))
    case WithBodySingle(agg, name, args, ret, flags, lang, body, jar) =>
      Some(statement(agg, name, args, ret, flags, lang, body.replace("''", "'"), jar))
    case WithBodyDouble(agg, name, args, ret, flags, lang, body, jar) =>
      Some(statement(agg, name, args, ret, flags, lang, body.replace("\"\"", "\""), jar))
    case WithoutBody(_, _, _) =>
      // Parses as our DDL but has no AS '<body>' clause — reference error
      // message parity (src/fusion.rs:57).
      throw new AdhesiveException(
        "class name or class definition should be provided")
    case _ => None
  }

  // Clause-level scan of the captured flags text (which FlagsToken already
  // guaranteed is a sequence of exactly these clauses): each match is one
  // whole flag, so flag detection is token-equality, never substring
  // sniffing — a hypothetical future flag containing "NOT" or
  // "DETERMINISTIC" as a fragment cannot mis-trip these.
  private val FlagClause =
    s"""(?is)NOT\\s+NULL|DETERMINISTIC|STATE\\s+($TypeToken)""".r

  private def statement(kindKw: String, name: String, args: String,
      ret: String, flags: String, lang: String, body: String,
      jar: String = null): CreateFunctionStatement = {
    val language = parseLanguage(lang)
    if (jar != null && language != LangClass) {
      throw new AdhesiveException(
        "USING JAR is only supported with LANGUAGE CLASS")
    }
    val kind = Option(kindKw).map(_.trim.toUpperCase(Locale.ROOT)) match {
      case None              => KindScalar
      case Some("AGGREGATE") => KindAggregate
      case Some("TABLE")     => KindTable
      case Some(other) => // unreachable by regex; keep the failure loud
        throw new AdhesiveException(s"unknown function kind '$other'")
    }
    val flagsText = Option(flags).getOrElse("")
    var nonNullable = false
    var deterministic = false
    var stateType: Option[DataType] = None
    // Duplicate flags are DDL errors, not silent last-wins: `STATE BIGINT
    // STATE DOUBLE` parses, and dropping one arbitrarily would hide a
    // typo'd buffer type until runtime (likewise a repeated NOT
    // NULL/DETERMINISTIC usually marks an editing mistake).
    def dupFlag(flag: String): Nothing =
      throw new AdhesiveException(s"duplicate $flag clause")
    FlagClause.findAllMatchIn(flagsText).foreach { m =>
      val clause =
        m.matched.toUpperCase(Locale.ROOT).split("\\s+").take(1).mkString
      clause match {
        case "NOT" =>
          if (nonNullable) dupFlag("NOT NULL")
          nonNullable = true
        case "DETERMINISTIC" =>
          if (deterministic) dupFlag("DETERMINISTIC")
          deterministic = true
        case "STATE" =>
          if (stateType.isDefined) dupFlag("STATE")
          stateType = Some(parseType(m.group(1)))
        case _ => () // unreachable: FlagClause admits only these
      }
    }
    if (kind != KindAggregate && stateType.isDefined) {
      throw new AdhesiveException(
        "STATE is only supported with CREATE AGGREGATE FUNCTION")
    }
    if (kind == KindAggregate && nonNullable) {
      throw new AdhesiveException(
        "NOT NULL is not supported for aggregate functions " +
          "(finish() may legitimately return NULL)")
    }
    if (kind == KindTable && nonNullable) {
      throw new AdhesiveException(
        "NOT NULL is not supported for table functions; declare column " +
          "types inside RETURNS TABLE(...)")
    }
    val tableSchema = parseTableSchema(ret)
    (kind, tableSchema) match {
      case (KindTable, None) =>
        throw new AdhesiveException(
          "CREATE TABLE FUNCTION requires RETURNS TABLE(col TYPE, ...)")
      case (k, Some(_)) if k != KindTable =>
        throw new AdhesiveException(
          "RETURNS TABLE(...) requires CREATE TABLE FUNCTION")
      case _ => ()
    }
    CreateFunctionStatement(name, parseArgTypes(args),
      // a table function's "return type" is its row struct, recorded in
      // tableSchema; NullType marks the placeholder slot
      tableSchema.fold(parseType(ret))(_ => NullType),
      language, body,
      deterministic = deterministic,
      nonNullable = nonNullable,
      jarPath = Option(jar).map(_.replace("''", "'")),
      kind = kind,
      stateType = stateType,
      tableSchema = tableSchema)
  }

  private val TablePattern = """(?is)^TABLE\s*\((.+)\)$""".r

  /** Parse `TABLE(col TYPE, ...)` into the output row schema; None when
    * the RETURNS clause is a plain type.
    */
  private def parseTableSchema(ret: String): Option[StructType] =
    ret.trim match {
      case TablePattern(colsText) =>
        val cols = splitTopLevel(colsText).map(_.trim).filter(_.nonEmpty)
        if (cols.isEmpty) {
          throw new AdhesiveException(
            "RETURNS TABLE(...) needs at least one column")
        }
        Some(StructType(cols.map { c =>
          c.split("\\s+", 2) match {
            case Array(colName, colType) if colName.matches("\\w+") =>
              StructField(colName, parseType(colType))
            case _ =>
              throw new AdhesiveException(
                s"cannot parse TABLE column '$c'; expected: name TYPE")
          }
        }))
      case _ => None
    }

  /** Execute adhesive DDL against a session directly — the programmatic
    * path (reference E3, `src/jvm.rs:287-301`) for sessions built without
    * [[AdhesiveSparkExtensions]].
    *
    * @return true if the statement was adhesive DDL and was executed.
    */
  def execute(spark: SparkSession, sqlText: String): Boolean =
    parse(sqlText) match {
      case Some(stmt) => run(spark, stmt); true
      case None       => false
    }

  def run(spark: SparkSession, stmt: CreateFunctionStatement): Unit =
    (stmt.language, stmt.kind) match {
      case (LangJava, KindScalar) =>
        AdhesiveRegistry.registerJavaSource(
          spark, stmt.name, stmt.body, stmt.argTypes, stmt.returnType,
          nonNullable = stmt.nonNullable, deterministic = stmt.deterministic)
      case (LangScala, KindScalar) =>
        AdhesiveRegistry.registerScalaSource(
          spark, stmt.name, stmt.body, stmt.argTypes, stmt.returnType,
          nonNullable = stmt.nonNullable, deterministic = stmt.deterministic)
      case (LangClass, KindScalar) =>
        AdhesiveRegistry.registerClass(
          spark, stmt.name, stmt.body.trim, stmt.argTypes, stmt.returnType,
          nonNullable = stmt.nonNullable, deterministic = stmt.deterministic,
          jarPath = stmt.jarPath)
      case (LangJava, KindAggregate) =>
        AdhesiveRegistry.registerJavaSourceAggregate(
          spark, stmt.name, stmt.body, stmt.argTypes, stmt.returnType,
          stateType = stmt.stateType, deterministic = stmt.deterministic)
      case (LangScala, KindAggregate) =>
        AdhesiveRegistry.registerScalaSourceAggregate(
          spark, stmt.name, stmt.body, stmt.argTypes, stmt.returnType,
          stateType = stmt.stateType, deterministic = stmt.deterministic)
      case (LangClass, KindAggregate) =>
        AdhesiveRegistry.registerClassAggregate(
          spark, stmt.name, stmt.body.trim, stmt.argTypes, stmt.returnType,
          stateType = stmt.stateType, jarPath = stmt.jarPath,
          deterministic = stmt.deterministic)
      case (LangJava, KindTable) =>
        AdhesiveRegistry.registerJavaSourceTableFunction(
          spark, stmt.name, stmt.body, stmt.argTypes, stmt.tableSchema.get)
      case (LangScala, KindTable) =>
        AdhesiveRegistry.registerScalaSourceTableFunction(
          spark, stmt.name, stmt.body, stmt.argTypes, stmt.tableSchema.get)
      case (LangClass, KindTable) =>
        AdhesiveRegistry.registerClassTableFunction(
          spark, stmt.name, stmt.body.trim, stmt.argTypes,
          stmt.tableSchema.get, jarPath = stmt.jarPath)
    }

  private def parseLanguage(lang: String): Language =
    Option(lang).map(_.toLowerCase(Locale.ROOT)) match {
      case None | Some("java") => LangJava // default language = JAVA
      case Some("class")       => LangClass
      case Some("scala")       => LangScala
      case Some(other) =>
        throw new AdhesiveException(s"language '$other' not supported; " +
          "supported: JAVA, SCALA, CLASS")
    }

  /** Split on TOP-LEVEL commas only: commas nested inside DECIMAL(p,s)
    * parens or ARRAY<...> angles belong to their type token.
    */
  private def splitTopLevel(text: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    text.foreach {
      case c @ ('(' | '<')   => depth += 1; cur += c
      case c @ (')' | '>')   => depth -= 1; cur += c
      case ',' if depth == 0 => parts += cur.result(); cur.clear()
      case c                 => cur += c
    }
    parts += cur.result()
    parts.toIndexedSeq
  }

  private def parseArgTypes(args: String): Seq[DataType] = {
    val trimmed = args.trim
    if (trimmed.isEmpty) Seq.empty
    else splitTopLevel(trimmed).map(t => parseType(t.trim))
  }

  private val DecimalPattern =
    """(?i)^(?:DECIMAL|NUMERIC)\s*(?:\(\s*(\d+)\s*,\s*(\d+)\s*\))?$""".r
  private val ArrayPattern = """(?is)^ARRAY\s*<(.+)>$""".r
  private val MapPattern = """(?is)^MAP\s*<(.+)>$""".r
  private val StructPattern = """(?is)^STRUCT\s*<(.+)>$""".r

  private[adhesive] def parseType(t: String): DataType = {
    val trimmed = t.trim
    trimmed.toUpperCase(Locale.ROOT) match {
      case "BIGINT" | "LONG"            => LongType
      case "INT" | "INTEGER"            => IntegerType
      case "SMALLINT" | "SHORT"         => ShortType
      case "TINYINT" | "BYTE"           => ByteType
      case "FLOAT" | "REAL"             => FloatType
      case "DOUBLE"                     => DoubleType
      case "STRING" | "VARCHAR" | "TEXT" => StringType
      case "BOOLEAN" | "BOOL"           => BooleanType
      case "DATE"                       => DateType
      case "TIMESTAMP"                  => TimestampType
      case "BINARY"                     => BinaryType
      // Parameterized forms match on the ORIGINAL text (all patterns are
      // (?i)): STRUCT field names must keep their declared case.
      case _ => trimmed match {
        case DecimalPattern(p, s) =>
          // bare DECIMAL defaults to Spark SQL's DECIMAL(10,0)
          if (p == null) DecimalType(10, 0)
          else {
            val (prec, scale) = (p.toInt, s.toInt)
            if (prec < 1 || prec > DecimalType.MAX_PRECISION || scale > prec) {
              throw new AdhesiveException(
                s"invalid DECIMAL($prec,$scale): need 1 <= precision <= " +
                  s"${DecimalType.MAX_PRECISION} and scale <= precision")
            }
            DecimalType(prec, scale)
          }
        case ArrayPattern(elem) => ArrayType(parseType(elem))
        case MapPattern(kv) =>
          splitTopLevel(kv).map(_.trim) match {
            case Seq(k, v) => MapType(parseType(k), parseType(v))
            case parts =>
              throw new AdhesiveException(
                s"MAP needs exactly two type parameters MAP<K,V>, " +
                  s"got ${parts.length}")
          }
        case StructPattern(fields) =>
          StructType(splitTopLevel(fields).map(_.trim).filter(_.nonEmpty)
            .map { f =>
              f.split("\\s*:\\s*", 2) match {
                case Array(n, ft) if n.matches("\\w+") =>
                  StructField(n, parseType(ft))
                case _ =>
                  throw new AdhesiveException(
                    s"cannot parse STRUCT field '$f'; expected name: TYPE")
              }
            })
        case other =>
          throw new AdhesiveException(
            s"type ${other.toUpperCase(Locale.ROOT)} not supported " +
              "(to be added)")
      }
    }
  }
}
