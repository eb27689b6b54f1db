package graft.pipeline

import java.util.{Map => JMap, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException,
  TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead,
  SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write,
  Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter,
  InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSourceV2 [[TableCatalog]] over versioned tables — the
  * natural end-state of the SQL surface: registered as
  * {{{
  *   spark.sql.catalog.vt           = graft.pipeline.VersionedCatalog
  *   spark.sql.catalog.vt.warehouse = /data/tables
  * }}}
  * after which the STANDARD statements work with no regex front-end:
  * `CREATE TABLE vt.docs (…) PARTITIONED BY (days(ts), bucket(16, id))
  * TBLPROPERTIES ('stats'='id,n')`, `INSERT INTO vt.docs SELECT …`,
  * `SELECT … FROM vt.docs`, `SELECT … FROM vt.docs VERSION AS OF 3`
  * (and `TIMESTAMP AS OF`), `ALTER TABLE vt.docs ADD COLUMNS (…)`,
  * `DROP TABLE vt.docs`, `spark.read.table("vt.docs")`,
  * `df.writeTo("vt.docs").append()`.
  *
  * The bridge is deliberately THIN: reads hand Spark a [[V1Scan]]
  * whose `buildScan` re-enters [[VersionedTable.sqlRead]] — the
  * pushed filters are re-applied INSIDE that nested plan, where
  * Catalyst pushes them into the pruning FileIndex, so manifest
  * shard/file pruning, typed bounds, null counts and blooms all fire
  * exactly as on the temp-view path (every pushed filter is also
  * returned as a residual, so Spark re-checks them above the scan:
  * pruning can narrow I/O but never the answer). Writes hand Spark a
  * [[V1Write]] whose insert IS [[VersionedTable.append]] — the
  * optimistic commit, the declared cluster shape, typed stats and
  * null counts all apply because it is the same code path.
  * `PARTITIONED BY` transforms map one-to-one onto the table's
  * declared cluster spec ([[VersionedTable.append]]'s `clusterBy`).
  *
  * Tables live at `<warehouse>/<namespace…>/<name>`; creation is the
  * table format's own: one EMPTY versioned append fixing schema, stat
  * columns (`TBLPROPERTIES('stats'='…')`, default: every top-level
  * BIGINT column; `'typed'='…'` for string/date/timestamp/decimal
  * stat columns, default: every top-level STRING column), and the
  * cluster spec. Rename is refused (roots are physical paths — the
  * one Iceberg-ism a path-addressed catalog cannot give).
  */
class VersionedCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse must point at a directory"))
  }

  override def name(): String = catalogName

  private def rootOf(ident: Identifier): String = {
    (ident.namespace() :+ ident.name()).foreach(p =>
      require(p.matches("[\\w-]+"),
        s"versioned catalog identifiers are path segments: '$p'"))
    (warehouse +: ident.namespace() :+ ident.name()).mkString("/")
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new java.io.File((warehouse +: namespace).mkString("/"))
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => new java.io.File(f, "manifests").isDirectory)
      .map(f => Identifier.of(namespace, f.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    VersionedTable.latestVersion(spark, rootOf(ident)).nonEmpty

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new VersionedV2Table(ident.toString, rootOf(ident), None)
  }

  /** `VERSION AS OF v` time travel through the standard SQL. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new VersionedV2Table(ident.toString, rootOf(ident),
      Some(version.toLong))
  }

  /** `TIMESTAMP AS OF t` — Spark hands the instant in MICROseconds. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val root = rootOf(ident)
    new VersionedV2Table(ident.toString, root,
      Some(VersionedTable.versionAsOf(spark, root, timestampMicros / 1000)))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala
    def listed(k: String): Option[Seq[String]] =
      props.get(k).map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
    val stats = listed("stats").getOrElse(
      schema.fields.filter(_.dataType ==
        org.apache.spark.sql.types.LongType).map(_.name).toSeq)
    val typed = listed("typed").getOrElse(
      schema.fields.filter(_.dataType ==
        org.apache.spark.sql.types.StringType).map(_.name).toSeq)
    // an all-string corpus table is legal: typed bounds carry the
    // pruning with no synthetic BIGINT column required
    require(stats.nonEmpty || typed.nonEmpty,
      s"CREATE TABLE $ident: a versioned table needs at least one " +
        "stat column — declare TBLPROPERTIES('stats'='col,…' and/or " +
        "'typed'='col,…') or include a BIGINT or STRING column")
    val clusterBy = partitions.toSeq.map(transformSpec)
    // TBLPROPERTIES('keys'='id,…') declares the UPDATE/MERGE key
    // columns, stamped into the stored schema's field metadata so
    // every later version carries them (the catalog twin of the regex
    // front-end's KEYS(...) registration)
    val keyed = listed("keys").map(ks =>
      VersionedTable.withKeyMetadata(schema, ks)).getOrElse(schema)
    // creation IS the format's own: one empty append publishes v1
    // with the schema, stat columns and cluster spec — no side
    // metadata store to drift from the table
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], keyed)
    VersionedTable.append(empty, rootOf(ident), stats, typed, clusterBy)
    loadTable(ident)
  }

  /** A DSv2 partition transform as the cluster-spec string the table
    * format stores — same grammar [[VersionedTable]] parses.
    */
  private def transformSpec(t: Transform): String = {
    def colOf: String = {
      val refs = t.references()
      require(refs.length == 1 && refs(0).fieldNames().length == 1,
        s"unsupported transform reference: $t")
      refs(0).fieldNames()(0)
    }
    t.name() match {
      case "identity" => colOf
      case "days" => s"days($colOf)"
      case "bucket" | "truncate" =>
        val n = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            l.value().toString
        }.getOrElse(throw new IllegalArgumentException(
          s"transform $t needs a numeric argument"))
        s"${t.name()}($n, $colOf)"
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform '$other' — supported: " +
          "identity, days, bucket(n, col), truncate(w, col)")
    }
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val root = rootOf(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val adds = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          s"ALTER TABLE $ident: nested adds are not supported")
        org.apache.spark.sql.types.StructField(
          a.fieldNames()(0), a.dataType(), nullable = true)
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE $ident: only ADD COLUMNS is supported, got $other")
    }
    VersionedTable.addColumns(spark, root, StructType(adds))
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    if (!tableExists(ident)) false
    else {
      val fs = new org.apache.hadoop.fs.Path(rootOf(ident))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(rootOf(ident)), true)
    }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "versioned tables are path-addressed; RENAME is not supported")
}

/** One versioned table (optionally pinned to a version) as a DSv2
  * [[Table]]: reads via a [[V1Scan]] over the pruning
  * [[VersionedTable.sqlRead]] plan, writes via a [[V1Write]] whose
  * insert is [[VersionedTable.append]]. Row-level SQL works on the
  * catalog identifier too: `DELETE FROM vt.t WHERE …` plans through
  * [[SupportsDelete]] (Spark translates the condition to source
  * filters, this table renders them back to the shared
  * [[VersionedSql.runDelete]] dispatch — long boxes take
  * `deleteRange`, typed predicates the stats-checked `deleteWhere`);
  * UPDATE/MERGE are rewritten by [[VersionedCatalogDmlRule]] onto the
  * same pinned commands the regex front-end runs.
  */
private[pipeline] class VersionedV2Table(ident: String, root: String,
    version: Option[Long]) extends Table with SupportsRead
    with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  private def spark: SparkSession = SparkSession.active

  /** The physical root — what the DML rewrite rule dispatches on. */
  private[pipeline] def tableRoot: String = root

  /** Some(v) when this handle is a `VERSION AS OF` pin — DML on a
    * time-travel snapshot is refused.
    */
  private[pipeline] def pinnedVersion: Option[Long] = version

  override def name(): String = ident

  override def schema(): StructType =
    VersionedTable.sqlRead(spark, root, version).schema

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE).asJava

  // ——— SupportsDelete: `DELETE FROM vt.t WHERE …` with a
  // filter-convertible condition. Spark only plans DeleteFromTableExec
  // when every conjunct translated, so the render below is total over
  // what arrives; the WHERE string re-enters the same dispatch as the
  // regex front-end (box probes → deleteRange, else stats-checked
  // deleteWhere — which still rejects an unprunable predicate loudly
  // rather than silently rewriting the whole table).

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    version.isEmpty && filters.forall(f => filterSql(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(version.isEmpty,
      s"cannot DELETE from a time-travel snapshot of $ident")
    // a no-WHERE delete arrives as AlwaysTrue (or an empty list,
    // depending on the planning path) — both mean "everything"
    val where = filters.toSeq.flatMap(filterSql)
        .filterNot(_ == "true") match {
      case Seq() =>
        // DELETE FROM t / TRUNCATE: everything goes. Render as a
        // full-range box over the first long stat column when one
        // exists (the fast deleteRange path); a typed-only table
        // truncates via an always-true COW rewrite.
        val (stats, _) = VersionedTable.statColumnsOf(spark, root)
        stats.headOption.map(c =>
          s"`$c` >= ${Long.MinValue} AND `$c` <= ${Long.MaxValue}")
          .getOrElse("true")
      case parts => parts.mkString(" AND ")
    }
    VersionedSql.runDelete(spark, ident, root, morDeletes = false, where)
    ()
  }

  /** A V1 source filter as WHERE-clause SQL; None = untranslatable
    * (Spark then reports the DELETE unsupported instead of planning
    * it). AlwaysTrue renders as None inside a conjunction-free list —
    * handled above.
    */
  private def filterSql(f: Filter): Option[String] = f match {
    case sources.AlwaysTrue() => Some("true")
    case sources.EqualTo(a, v) => litSql(v).map(l => s"${identSql(a)} = $l")
    case sources.GreaterThan(a, v) =>
      litSql(v).map(l => s"${identSql(a)} > $l")
    case sources.GreaterThanOrEqual(a, v) =>
      litSql(v).map(l => s"${identSql(a)} >= $l")
    case sources.LessThan(a, v) => litSql(v).map(l => s"${identSql(a)} < $l")
    case sources.LessThanOrEqual(a, v) =>
      litSql(v).map(l => s"${identSql(a)} <= $l")
    case sources.In(a, vs) =>
      val ls = vs.toSeq.map(litSql)
      if (ls.exists(_.isEmpty) || ls.isEmpty) None
      else Some(s"${identSql(a)} IN (${ls.flatten.mkString(", ")})")
    case sources.IsNull(a) => Some(s"${identSql(a)} IS NULL")
    case sources.IsNotNull(a) => Some(s"${identSql(a)} IS NOT NULL")
    case sources.And(l, r) =>
      for { ls <- filterSql(l); rs <- filterSql(r) }
        yield s"($ls AND $rs)"
    case _ => None // OR / NOT / StringStartsWith…: residual-only shapes
  }

  private def identSql(a: String): String = "`" + a.replace("`", "``") + "`"

  private def litSql(v: Any): Option[String] = v match {
    case null => None // `c = NULL` is never true; refuse the translation
    case s: String => Some("'" + s.replace("\\", "\\\\")
      .replace("'", "\\'") + "'")
    case s: org.apache.spark.unsafe.types.UTF8String =>
      litSql(s.toString)
    case d: java.sql.Date => Some(s"DATE '$d'")
    case d: java.time.LocalDate => Some(s"DATE '$d'")
    case t: java.sql.Timestamp => Some(s"TIMESTAMP '$t'")
    case t: java.time.Instant => Some(s"TIMESTAMP '$t'")
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: scala.math.BigDecimal => Some(d.underlying.toPlainString)
    case b: java.lang.Boolean => Some(b.toString)
    case n @ (_: java.lang.Long | _: java.lang.Integer |
              _: java.lang.Short | _: java.lang.Byte) =>
      Some(n.toString + "L")
    case n @ (_: java.lang.Double | _: java.lang.Float) =>
      Some(s"CAST(${n.toString} AS DOUBLE)")
    case _ => None
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new VersionedScanBuilder(spark, root, version, schema())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(version.isEmpty,
      s"cannot write to a time-travel snapshot of $ident")
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame,
                overwrite: Boolean): Unit = {
              require(!overwrite,
                s"INSERT OVERWRITE is not supported on versioned " +
                  s"table $ident — use DELETE/MERGE for row changes")
              val (stats, typed) =
                VersionedTable.statColumnsOf(spark, root)
              VersionedTable.append(data, root, stats, typed)
              ()
            }
          }
      }
    }
  }
}

private[pipeline] class VersionedScanBuilder(spark: SparkSession,
    root: String, version: Option[Long], fullSchema: StructType)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read
      .SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => filterColumn(f).isDefined)
    filters // ALL residual: Spark re-applies — pruning only narrows I/O
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val req = required
    val ps = pushed
    new V1Scan {
      override def readSchema(): StructType = req
      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T =
        new VersionedV1Relation(context, spark, root, version, req, ps)
          .asInstanceOf[T]
    }
  }

  /** A DSv2 source filter as a Column over the nested plan — only
    * shapes our FileIndex can prune on (plus AND of them); None means
    * the filter stays residual-only.
    */
  private def filterColumn(f: Filter): Option[
      org.apache.spark.sql.Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === v)
    case sources.GreaterThan(a, v) => Some(col(a) > v)
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case sources.LessThan(a, v) => Some(col(a) < v)
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= v)
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.And(l, r) =>
      for { lc <- filterColumn(l); rc <- filterColumn(r) } yield lc && rc
    case _ => None
  }

  private[pipeline] def filterColumns(fs: Array[Filter])
      : Seq[org.apache.spark.sql.Column] = fs.toSeq.flatMap(filterColumn)
}

/** The V1 relation the scan bridges to: `buildScan` executes the
  * pruning `sqlRead` plan with the pushed filters re-applied inside
  * it — Catalyst pushes them into the manifest FileIndex there, so
  * the catalog path prunes exactly like the temp-view path.
  */
private[pipeline] class VersionedV1Relation(context: SQLContext,
    spark: SparkSession, root: String, version: Option[Long],
    required: StructType, pushed: Array[Filter])
    extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = context
  override def schema: StructType = required

  override def buildScan(): RDD[Row] = {
    val builder = new VersionedScanBuilder(spark, root, version, required)
    val df0 = VersionedTable.sqlRead(spark, root, version)
    val filtered = builder.filterColumns(pushed).foldLeft(df0)(_.filter(_))
    filtered.select(required.fieldNames.toIndexedSeq.map(col): _*).rdd
  }
}
