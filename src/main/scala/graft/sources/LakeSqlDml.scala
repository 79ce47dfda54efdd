package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{And, Attribute,
  AttributeReference, CurrentDate, CurrentTimestampLike, EqualTo,
  Expression, In, Literal, LocalTimestamp, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable,
  SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}
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
    // the engine operator evaluates the predicate in its match scan
    // AND its rewrite projection (updateWhere's documented caller
    // contract) — a rand()/uuid() that flips between the two would
    // update a different row set than it scanned, so refuse up front
    if (!e.deterministic)
      throw new UnsupportedOperationException(
        s"$what must be deterministic: the copy-on-write update " +
          "evaluates it once to find the affected files and once in " +
          s"the rewrite — `$e` could differ between the two")
    // current_timestamp()/now()/current_date() are MARKED deterministic
    // (Catalyst's ComputeCurrentTime pins them per query) but the
    // engine operator runs the match scan and the rewrite as SEPARATE
    // queries — each gets its own pinned instant, so a time-window
    // condition could match different boundary rows in the two passes.
    // Same two-evaluation hazard, different mechanism: refuse, and name
    // the fix (a literal pins one instant for both passes).
    if (e.exists(x => x.isInstanceOf[CurrentDate] ||
        x.isInstanceOf[CurrentTimestampLike] ||
        x.isInstanceOf[LocalTimestamp]))
      throw new UnsupportedOperationException(
        s"$what uses current_date()/current_timestamp()/localtimestamp()" +
          " — the copy-on-write DML evaluates it as two separate queries" +
          " (match scan, rewrite), each pinning its own 'now', so a" +
          " time-window boundary could differ between the two. Pin the" +
          s" instant as a literal instead: `$e`")
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  /** The KEYED shape — a bare `key IN (literals…)` / `key = literal`
    * condition, the canonical takedown/correction list. Recognized so
    * the commands route to the keyed engine variants
    * ([[History.deleteKeysDV]] / [[History.updateKeys]]), whose match
    * scan rides the per-file bloom key index: on an unclustered
    * 100 TB lake, "these 10k ids" scans candidate files instead of
    * the lake. NULL literals fall back to the generic path (a bloom
    * probe has no null image; IN-with-NULL semantics stay exact
    * there). */
  private[sources] def keyedShape(e: Expression)
      : Option[(String, Seq[Any])] = {
    def lits(vs: Seq[Expression]): Option[Seq[Any]] =
      if (vs.nonEmpty && vs.forall {
            case l: Literal => l.value != null
            case _ => false
          })
        Some(vs.map { case l: Literal =>
          CatalystTypeConverters.convertToScala(l.value, l.dataType) })
      else None
    e match {
      case In(a: AttributeReference, vs) => lits(vs).map(a.name -> _)
      case EqualTo(a: AttributeReference, l: Literal) =>
        lits(Seq(l)).map(a.name -> _)
      case EqualTo(l: Literal, a: AttributeReference) =>
        lits(Seq(l)).map(a.name -> _)
      case _ => None
    }
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
        GraftUpdateCommand(path, cond, assigns,
          condition.flatMap(keyedShape))

      case m: MergeIntoTable
          if m.resolved && lakeTarget(m.targetTable).isDefined =>
        rewriteMerge(m, lakeTarget(m.targetTable).get)

      // with the extension installed, EVERY lake DELETE routes through
      // the engine directly — full expression power (doc_id % 17 = 5),
      // where the capability path ([[LakeSqlDelete]], still serving
      // extension-less sessions) accepts only exactly-convertible
      // source filters. Same verbs underneath: unconditional →
      // copy-on-write retire-all; conditional → deletion vectors.
      case d @ DeleteFromTable(target, condition)
          if d.resolved && lakeTarget(target).isDefined =>
        val path = lakeTarget(target).get
        val unconditional = condition match {
          case org.apache.spark.sql.catalyst.expressions.Literal(true, _) =>
            true
          case _ => false
        }
        GraftDeleteCommand(path,
          if (unconditional) None
          else Some(byName(condition, "a DELETE condition")),
          if (unconditional) None else keyedShape(condition))
    }

  /** The classic UPSERT shape — `WHEN MATCHED THEN UPDATE SET * WHEN
    * NOT MATCHED THEN INSERT *` joined on name-equal key columns —
    * maps EXACTLY onto the engine's keyed copy-on-write
    * [[History.mergeInto]] (same join keys, same whole-row source
    * image, same duplicate-source-key refusal), so that is the shape
    * this surface accepts; every other merge shape (conditioned
    * actions, partial SET lists, expressions over target columns,
    * DELETE actions, NOT MATCHED BY SOURCE, schema evolution) refuses
    * loudly with the engine-operator alternative named. One documented
    * deviation rides along from the engine operator: ALL target rows
    * sharing a matched key are superseded by the single source row for
    * that key (upsert-by-key), where standard MERGE would update each
    * copy in place — identical results on key-unique targets, which is
    * what an upsert key means. */
  private def rewriteMerge(m: MergeIntoTable, path: String): LogicalPlan = {
    def unsupported(what: String): Nothing =
      throw new UnsupportedOperationException(
        s"MERGE INTO through the lake SQL surface supports exactly the " +
          "upsert shape `ON <name-equal key equalities> WHEN MATCHED " +
          "THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`; " +
          s"$what is not — use the engine operator " +
          "(History.mergeInto / deleteKeys / updateWhere) for other " +
          "shapes")
    if (m.withSchemaEvolution) unsupported("WITH SCHEMA EVOLUTION")
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE")
    val sourceOut = m.sourceTable.outputSet
    val targetOut = m.targetTable.outputSet
    // ON: a conjunction of target-attr = source-attr equalities over
    // name-equal columns → the engine operator's by-name join keys
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keyCols = conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if (targetOut.contains(a) && sourceOut.contains(b)) ||
             (targetOut.contains(b) && sourceOut.contains(a)) =>
        val (t, s) = if (targetOut.contains(a)) (a, b) else (b, a)
        if (!t.name.equalsIgnoreCase(s.name))
          unsupported(s"ON ${t.name} = ${s.name} (key columns must be " +
            "name-equal for the by-name keyed merge)")
        t.name
      case other => unsupported(s"ON condition `$other`")
    }
    // the whole-row source image: every target column assigned its
    // name-equal bare source attribute, identically in both actions
    def image(assignments: Seq[Assignment],
              action: String): Map[String, AttributeReference] =
      assignments.map { a =>
        val t = a.key match {
          case ar: AttributeReference => ar
          case other => unsupported(s"$action of nested field $other")
        }
        a.value match {
          case s: AttributeReference
              if sourceOut.contains(s) && s.name.equalsIgnoreCase(t.name) =>
            t.name -> s
          case other => unsupported(
            s"$action `${t.name} = $other` (values must be the " +
              "name-equal source column — the SET * / INSERT * image)")
        }
      }.toMap
    val (up, in) = (m.matchedActions, m.notMatchedActions) match {
      case (Seq(UpdateAction(None, upA, _)), Seq(InsertAction(None, inA))) =>
        (image(upA, "UPDATE SET"), image(inA, "INSERT"))
      case _ => unsupported("this action list")
    }
    val targetCols = m.targetTable.output.map(_.name)
    if (up.keySet != targetCols.toSet)
      unsupported(s"a partial SET list (${up.keySet.mkString(",")})")
    if (up.map { case (k, v) => k -> v.exprId } !=
        in.map { case (k, v) => k -> v.exprId })
      unsupported("UPDATE and INSERT disagreeing on the source image")
    GraftMergeCommand(path, m.sourceTable,
      targetCols.map(c => c -> up(c)), keyCols.distinct)
  }
}

/** The eager command a lake UPDATE plans to: runs
  * [[History.updateWhere]] and returns its (files, rows) receipt as
  * the statement's result row. */
case class GraftUpdateCommand(path: String, condition: Column,
    assignments: Seq[(String, Column)],
    keyed: Option[(String, Seq[Any])] = None)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_rewritten", IntegerType, nullable = false)(),
    AttributeReference("rows_updated", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    // a bare key-list condition rides the bloom key index
    // (index-independent correctness — see History.updateKeys)
    val (files, rows) = keyed match {
      case Some((k, vs)) => History.updateKeys(spark, path, k, vs,
        assignments)
      case None => History.updateWhere(spark, path, condition, assignments)
    }
    Seq(Row(files, rows))
  }
}

/** The eager command a lake DELETE plans to under the extension:
  * condition-bearing deletes land as merge-on-read deletion vectors
  * ([[History.deleteWhereDV]] — zero data files rewritten);
  * unconditional deletes (and TRUNCATE) retire every file
  * copy-on-write ([[History.deleteWhere]]). NULL predicate keeps the
  * row, SQL DELETE semantics, enforced inside the operators. */
case class GraftDeleteCommand(path: String, condition: Option[Column],
    keyed: Option[(String, Seq[Any])] = None)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_touched", IntegerType, nullable = false)(),
    AttributeReference("rows_deleted", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    // a bare key-list condition (the canonical takedown list) rides
    // the bloom key index — see History.deleteKeysDV. A DENSE delete
    // (> the DV position cap) falls back to the copy-on-write path —
    // SQL consumers have no engine-API escape hatch, so the verb must
    // run both shapes; the predicate is deterministic (enforced at
    // analysis), so re-evaluating it in the COW pass matches the same
    // rows the DV pass over-counted.
    // the DV-vs-COW density threshold is a session knob
    // (spark.graft.dml.dvMaxPositions) — same ceiling contract as the
    // engine operators' maxPositions parameter
    val cap = spark.conf
      .get("spark.graft.dml.dvMaxPositions", "10000000").toLong
    val (files, rows) = (condition, keyed) match {
      case (None, _) => History.deleteWhere(spark, path, lit(true))
      case (_, Some((k, vs))) =>
        try History.deleteKeysDV(spark, path, k, vs, cap)
        catch { case _: DvCapExceededException =>
          History.deleteKeys(spark, path, k, vs) }
      case (Some(pred), None) =>
        try History.deleteWhereDV(spark, path, pred, cap)
        catch { case _: DvCapExceededException =>
          History.deleteWhere(spark, path, pred) }
    }
    Seq(Row(files, rows))
  }
}

/** The eager command a lake MERGE plans to: the source subtree becomes
  * the updates frame (selected down to exactly the target columns, by
  * exprId so duplicate source names cannot misbind), then
  * [[History.mergeInto]] runs the keyed copy-on-write upsert and the
  * statement returns its (files touched, rows replaced) receipt. */
case class GraftMergeCommand(path: String, source: LogicalPlan,
    imageCols: Seq[(String, AttributeReference)], keyCols: Seq[String])
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_touched", IntegerType, nullable = false)(),
    AttributeReference("rows_replaced", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val updates = DatasetBridge.ofRows(spark, source)
      .select(imageCols.map { case (name, attr) =>
        ColumnBridge.column(attr).as(name)
      }: _*)
    // mergeInto's caller contract: the updates frame is evaluated
    // several times (dup check, semi-join, anti-join, staged write) —
    // an engine caller caches a non-trivial plan, a SQL user can't, so
    // cache here for the operator's duration (spills past memory; a
    // correction batch is small next to the lake by construction)
    updates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (files, rows) = History.mergeInto(spark, path, updates, keyCols)
      Seq(Row(files, rows))
    } finally {
      updates.unpersist(blocking = false): Unit
    }
  }
}
