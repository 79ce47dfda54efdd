package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan,
  SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL `UPDATE lake.\`/path\` SET … WHERE …` for manifest lakes.
  *
  * Spark has no capability trait for UPDATE short of the full
  * row-level-operation machinery (whose ReplaceData write path is
  * V2-only — no V1 fallback), so this follows the same pattern the
  * mainstream lakehouse formats use: a post-hoc RESOLUTION RULE
  * (injected by [[graft.GraftExtensions]], i.e.
  * `--conf spark.sql.extensions=graft.GraftExtensions`) that rewrites
  * a resolved [[UpdateTable]] over a lake-catalog table into an eager
  * command running the engine's copy-on-write file-granular
  * [[History.updateWhere]] — one filter-pushed match scan to find the
  * affected files, one job rewriting exactly those files, staged-bytes
  * CHECK validation, one OCC manifest flip. A SQL-issued UPDATE is
  * therefore indistinguishable from an engine-issued one: the change
  * feed emits the rewrite, time travel to the pre-update version still
  * answers until vacuum, and concurrent DV landings conflict loudly.
  *
  * Resolved Catalyst expressions (condition, assignment values) are
  * re-anchored BY NAME before handing to the engine operator — its
  * rewrite scan is a different plan, so exprId-bound attribute
  * references cannot cross; plain name references can, and the lake's
  * flat relational schema makes by-name unambiguous. Conditions or
  * values carrying subqueries refuse loudly (the engine operator
  * evaluates predicates against its own scan, where a foreign subquery
  * cannot be replayed); nested-field assignment targets likewise.
  * Without the extension installed, UPDATE on a lake table fails with
  * Spark's stock unsupported error — never silently. Time-travel pins
  * refuse: an update targets the lake's PRESENT. */
object LakeDmlRule {

  /** The lake root when `plan` is a latest-version lake-catalog table
    * accepting row-level DML (alias wrappers stripped). */
  private[sources] def lakeTarget(plan: LogicalPlan): Option[String] =
    plan match {
      case SubqueryAlias(_, child) => lakeTarget(child)
      case r: DataSourceV2Relation => r.table match {
        case t: LakeSqlDelete => t.sqlDmlTarget
        case _ => None
      }
      case _ => None
    }

  /** A resolved expression re-anchored by NAME: attribute references
    * become unresolved name lookups, so the engine operator's own scan
    * can resolve them. Refuses subqueries — they bind to THIS plan's
    * execution and cannot be replayed inside the operator. */
  private[sources] def byName(e: Expression, what: String): Column = {
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      throw new UnsupportedOperationException(
        s"$what with a subquery is not supported through the lake SQL " +
          "surface — materialize the subquery (CREATE a temp table / " +
          "use the engine operator) and reference it by value")
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }
}

/** Post-hoc resolution rule: resolved DML plans over lake-catalog
  * tables → eager engine commands. Injected via
  * [[graft.GraftExtensions]]; non-lake tables pass through untouched. */
class LakeDmlRule(session: SparkSession) extends Rule[LogicalPlan] {
  import LakeDmlRule._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u @ UpdateTable(target, assignments, condition)
          if u.resolved && lakeTarget(target).isDefined =>
        val path = lakeTarget(target).get
        val assigns = assignments.map { a =>
          val name = a.key match {
            case ar: AttributeReference => ar.name
            case other => throw new UnsupportedOperationException(
              s"UPDATE of a nested field ($other) is not supported — " +
                "assign top-level lake columns")
          }
          name -> byName(a.value, "an UPDATE assignment")
        }
        val cond = condition.map(byName(_, "an UPDATE condition"))
          .getOrElse(lit(true))
        GraftUpdateCommand(path, cond, assigns)
    }
}

/** The eager command a lake UPDATE plans to: runs
  * [[History.updateWhere]] and returns its (files, rows) receipt as
  * the statement's result row. */
case class GraftUpdateCommand(path: String, condition: Column,
    assignments: Seq[(String, Column)]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_rewritten", IntegerType, nullable = false)(),
    AttributeReference("rows_updated", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (files, rows) = History.updateWhere(spark, path, condition,
      assignments)
    Seq(Row(files, rows))
  }
}
