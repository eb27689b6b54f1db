package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  AttributeSet, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteAction, InsertAction, InsertStarAction, LogicalPlan,
  MergeIntoTable, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Rewrites resolved `UPDATE` / `MERGE INTO` statements whose target
  * is a [[VersionedV2Table]] (a `vt.`-qualified catalog identifier)
  * onto the SAME pinned read-compute-commit commands the regex
  * front-end runs ([[VersionedUpdateCommand]] /
  * [[VersionedMergeCommand]]) — Spark itself has no execution for
  * these nodes unless the table implements `SupportsRowLevelOperations`
  * (its planner throws "not supported temporarily"), so a post-hoc
  * resolution rule is the documented connector seam for routing them
  * to engine-native DML. DELETE needs no rule: the table's
  * `SupportsDelete` covers it inside Spark's own planning.
  *
  * The bridge is NAME-based by construction: the commands join a
  * FRESH pinned snapshot read under synthetic aliases, so the
  * analyzed expressions (bound to this statement's attribute ids)
  * are re-rendered as SQL over those aliases — target attributes as
  * `__vt_tgt.col`, source attributes as `__vt_src.col`. Key columns
  * come from the table's declared keys
  * (`TBLPROPERTIES('keys'='…')`, [[VersionedTable.keyColsOf]]) for
  * UPDATE, and from the MERGE ON equalities (checked against the
  * declaration when one exists) for MERGE — the same rules the regex
  * grammar enforces.
  */
class VersionedCatalogDmlRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private val TgtAlias = "__vt_tgt"
  private val SrcAlias = "__vt_src"

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(target, assignments, condition) if u.resolved =>
      vtOf(target) match {
        case Some(vt) => rewriteUpdate(vt, assignments, condition)
        case None => u
      }
    case m: MergeIntoTable if m.resolved =>
      vtOf(m.targetTable) match {
        case Some(vt) => rewriteMerge(vt, m)
        case None => m
      }
    case _ => plan
  }

  private def vtOf(target: LogicalPlan): Option[VersionedV2Table] =
    target.collectFirst {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[VersionedV2Table] =>
        r.table.asInstanceOf[VersionedV2Table]
    }

  private def notPinned(vt: VersionedV2Table, stmt: String): Unit =
    require(vt.pinnedVersion.isEmpty,
      s"$stmt ${vt.name()}: cannot modify a time-travel snapshot")

  /** A resolved expression as SQL over the commands' synthetic
    * aliases: attributes of the target relation render as
    * `__vt_tgt.name`, of the source as `__vt_src.name`. Bare mode
    * (UPDATE — single relation) strips the qualifier entirely.
    */
  private def renderSql(e: Expression, tgt: AttributeSet,
      src: AttributeSet): String =
    e.transform {
      case a: AttributeReference if tgt.contains(a) =>
        UnresolvedAttribute(Seq(TgtAlias, a.name))
      case a: AttributeReference if src.contains(a) =>
        UnresolvedAttribute(Seq(SrcAlias, a.name))
      case a: AttributeReference =>
        UnresolvedAttribute(Seq(a.name))
    }.sql

  private def bareSql(e: Expression): String =
    e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    }.sql

  private def assignName(vt: VersionedV2Table, a: Assignment): String =
    a.key match {
      case ar: AttributeReference => ar.name
      case other => throw new IllegalArgumentException(
        s"UPDATE/MERGE ${vt.name()}: only top-level column " +
          s"assignments are supported; got '${other.sql}'")
    }

  private def rewriteUpdate(vt: VersionedV2Table,
      assignments: Seq[Assignment],
      condition: Option[Expression]): LogicalPlan = {
    notPinned(vt, "UPDATE")
    val keys = VersionedTable.keyColsOf(spark, vt.tableRoot)
    require(keys.nonEmpty,
      s"UPDATE ${vt.name()}: the table declares no key columns — an " +
        "update is a keyed replace and needs them (CREATE TABLE … " +
        "TBLPROPERTIES('keys'='col,…'))")
    val sets = assignments.map(a => (assignName(vt, a), bareSql(a.value)))
    VersionedUpdateCommand(vt.name(),
      VersionedSql.Registration(vt.tableRoot, keys, morDeletes = false),
      sets, condition.map(bareSql).getOrElse("true"))
  }

  /** The MERGE ON conjunction as the key column list — each conjunct
    * must equate one target attribute with one same-named source
    * attribute, the shape a keyed merge can address (mirrors the
    * regex grammar's `mergeKeys`).
    */
  private def mergeKeys(vt: VersionedV2Table, e: Expression,
      tgt: AttributeSet, src: AttributeSet): Seq[String] = {
    // the analyzer wraps the narrower side of a mixed-width equality
    // in a Cast (e.g. an INT VALUES source against a BIGINT key) —
    // the attribute under it is still the key
    def unwrap(x: Expression): Expression = x match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast =>
        unwrap(c.child)
      case other => other
    }
    e match {
      case And(l, r) =>
        mergeKeys(vt, l, tgt, src) ++ mergeKeys(vt, r, tgt, src)
      case EqualTo(l, r) => (unwrap(l), unwrap(r)) match {
        case (a: AttributeReference, b: AttributeReference)
            if a.name.equalsIgnoreCase(b.name) &&
              ((tgt.contains(a) && src.contains(b)) ||
                (tgt.contains(b) && src.contains(a))) =>
          Seq(if (tgt.contains(a)) a.name else b.name)
        case _ => throw new IllegalArgumentException(
          s"MERGE INTO ${vt.name()}: ON must be a conjunction of " +
            s"same-named key equalities (t.k = s.k); cannot express: " +
            s"'${e.sql}'")
      }
      case other => throw new IllegalArgumentException(
        s"MERGE INTO ${vt.name()}: ON must be a conjunction of " +
          s"same-named key equalities (t.k = s.k); cannot express: " +
          s"'${other.sql}'")
    }
  }

  private def rewriteMerge(vt: VersionedV2Table,
      m: MergeIntoTable): LogicalPlan = {
    notPinned(vt, "MERGE INTO")
    require(!m.withSchemaEvolution,
      s"MERGE INTO ${vt.name()}: WITH SCHEMA EVOLUTION is not " +
        "supported — evolve explicitly with ALTER TABLE … ADD COLUMNS")
    val tgt = m.targetTable.outputSet
    val src = m.sourceTable.outputSet
    val keys = mergeKeys(vt, m.mergeCondition, tgt, src).distinct
    val declared = VersionedTable.keyColsOf(spark, vt.tableRoot)
    def lc(s: Seq[String]) =
      s.map(_.toLowerCase(java.util.Locale.ROOT)).sorted
    require(declared.isEmpty || lc(keys) == lc(declared),
      s"MERGE INTO ${vt.name()}: ON keys $keys != the table's " +
        s"declared keys $declared")
    def q(e: Expression): String = renderSql(e, tgt, src)
    def cond(c: Option[Expression]): Option[String] = c.map(q)
    // a SET-star expansion assigns every column including the keys —
    // under the ON equality the key assignment is the identity, so it
    // is dropped rather than tripping the keyed command's key-touch
    // guard; a NON-identity key assignment still rejects loudly there
    def isKeyIdentity(name: String, value: Expression): Boolean = {
      def unwrap(x: Expression): Expression = x match {
        case c: org.apache.spark.sql.catalyst.expressions.Cast =>
          unwrap(c.child)
        case other => other
      }
      keys.exists(_.equalsIgnoreCase(name)) && (unwrap(value) match {
        case ar: AttributeReference => ar.name.equalsIgnoreCase(name)
        case _ => false
      })
    }
    def updateSets(as: Seq[Assignment]): VersionedSql.MergeAction =
      VersionedSql.MergeUpdateSet(as.collect {
        case a if !isKeyIdentity(assignName(vt, a), a.value) =>
          (assignName(vt, a), q(a.value))
      })
    def insertValues(as: Seq[Assignment]): VersionedSql.MergeAction =
      VersionedSql.MergeInsertValues(
        as.map(assignName(vt, _)), as.map(a => q(a.value)))
    def clause(kind: VersionedSql.MergeMatchKind,
        action: org.apache.spark.sql.catalyst.plans.logical.MergeAction)
        : VersionedSql.MergeClause = action match {
      case DeleteAction(c) =>
        VersionedSql.MergeClause(kind, cond(c), VersionedSql.MergeDelete)
      case UpdateAction(c, as, _) => // fromStar: SET * pre-expanded
        VersionedSql.MergeClause(kind, cond(c), updateSets(as))
      case UpdateStarAction(c) =>
        VersionedSql.MergeClause(kind, cond(c),
          VersionedSql.MergeUpdateStar)
      case InsertAction(c, as) =>
        VersionedSql.MergeClause(kind, cond(c), insertValues(as))
      case InsertStarAction(c) =>
        VersionedSql.MergeClause(kind, cond(c),
          VersionedSql.MergeInsertStar)
      case other => throw new IllegalArgumentException(
        s"MERGE INTO ${vt.name()}: unsupported action $other")
    }
    val clauses =
      m.matchedActions.map(clause(VersionedSql.Matched, _)) ++
        m.notMatchedActions.map(
          clause(VersionedSql.NotMatchedByTarget, _)) ++
        m.notMatchedBySourceActions.map(
          clause(VersionedSql.NotMatchedBySource, _))
    VersionedMergeCommand(vt.name(),
      VersionedSql.Registration(vt.tableRoot, keys, morDeletes = false),
      targetAlias = Some(TgtAlias), sourceSql = "",
      sourceAlias = Some(SrcAlias), onCond = q(m.mergeCondition),
      keyCols = keys, clauses = clauses,
      sourcePlan = Some(m.sourceTable))
  }
}
