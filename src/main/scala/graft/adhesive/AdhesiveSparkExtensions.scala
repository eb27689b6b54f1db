package graft.adhesive

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Row, SparkSession}

/** The DDL-executing command node. Planned like any other DDL: `spark.sql(
  * "CREATE FUNCTION f(BIGINT, BIGINT) RETURNS BIGINT LANGUAGE JAVA AS '…'")`
  * compiles and registers at *execution* of the returned DataFrame's plan
  * (which `spark.sql` triggers eagerly for commands, matching the
  * reference's DDL-time compile, `/root/reference/src/fusion.rs:23-27`).
  */
case class CreateAdhesiveFunctionCommand(
    stmt: AdhesiveDdl.CreateFunctionStatement)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq.empty
  override def run(sparkSession: SparkSession): Seq[Row] = {
    AdhesiveDdl.run(sparkSession, stmt)
    Seq.empty
  }
}

/** Parser that recognizes the adhesive `CREATE FUNCTION` grammar (and
  * the versioned-table DDL/DML, [[graft.pipeline.VersionedSql]]) and
  * delegates everything else to Spark's parser — the Spark-idiomatic
  * equivalent of DataFusion's `FunctionFactory` hook the reference plugs
  * into (`src/fusion.rs:22-80`): Spark has no factory for
  * source-carrying DDL, so the extension point is the parser.
  */
class AdhesiveSqlParser(session: () => SparkSession,
    delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    AdhesiveDdl.parse(sqlText) match {
      case Some(stmt) => CreateAdhesiveFunctionCommand(stmt)
      case None =>
        graft.pipeline.VersionedSql.parse(session(), sqlText, delegate)
          .getOrElse(delegate.parsePlan(sqlText))
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Session extension: `SparkSession.builder().withExtensions(new
  * AdhesiveSparkExtensions)` or
  * `--conf spark.sql.extensions=graft.adhesive.AdhesiveSparkExtensions`.
  */
class AdhesiveSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((session, delegate) =>
      new AdhesiveSqlParser(() => session, delegate))
    // UPDATE/MERGE over vt.* catalog identifiers → the versioned
    // table's pinned DML commands (post-hoc: the statements must be
    // fully resolved before their expressions can be re-rendered)
    ext.injectPostHocResolutionRule(session =>
      new graft.pipeline.VersionedCatalogDmlRule(session))
    // runs in the user-provided-rules batch, after Spark's own constant
    // folding has turned literal-valued subtrees into Literals
    ext.injectOptimizerRule(_ => AdhesiveConstantFolding)
  }
}
