package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualTo, Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.sources.{SnapshotManifest, SnapshotTable}

/** Post-hoc resolution rule wiring the snapshot format into Spark's SQL
  * statement surface (round-13 VERDICT asks #1/#2/#3). Injected by
  * [[graft.GraftExtensions]]; runs once, after the main resolution batch
  * (conditions, assignments and MERGE stars are resolved) and BEFORE
  * `CheckAnalysis` (which would otherwise reject row-level statements on
  * a table without `SupportsRowLevelOperations`). Two rewrites:
  *
  *  1. '''SQL DML → commit verbs.''' `DELETE FROM t WHERE …`,
  *     `UPDATE t SET … WHERE …` and the standard `MERGE INTO` shapes
  *     against a registered snapshot table become [[LeafRunnableCommand]]s
  *     over the engine's gated verbs ([[SnapshotManifest.deleteWhere]],
  *     [[SnapshotManifest.updateWhere]],
  *     [[graft.operators.Upsert.mergeWhere]]) — the same churn-bounded,
  *     stats-pruned, conflict-rebasing implementations the API exposes
  *     (reference MERGE semantics: bi_utils `utils.py:265-292`).
  *     Unsupported clause shapes fail LOUDLY with the supported grammar
  *     in the message — never a silent wrong answer.
  *  2. '''Materialized serve for non-file-relation versions.''' A catalog
  *     read of a version with live deletion-vector sidecars (or an empty
  *     body) cannot plan as a pure file scan; its `DataSourceV2Relation`
  *     is rewritten to the distributed MoR read
  *     ([[SnapshotManifest.readVersion]] — sidecar anti-join on
  *     executors), output-aliased back to the relation's attribute ids so
  *     the surrounding plan is untouched. Write targets are unaffected
  *     (`V2WriteCommand.table` is not a child).
  */
final case class SnapshotStatements(spark: SparkSession)
    extends Rule[LogicalPlan] {

  import SnapshotStatements._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val afterDml = plan.resolveOperatorsUp {
      case d @ DeleteFromTable(SnapshotV2(_, t), cond) if d.resolved =>
        refuseSubquery(cond, "DELETE")
        GraftDeleteCommand(t.root, cond)

      case u @ UpdateTable(SnapshotV2(_, t), assignments, cond)
          if u.resolved =>
        cond.foreach(refuseSubquery(_, "UPDATE"))
        val sets = assignments.map { a =>
          val name = a.key match {
            case ar: AttributeReference => ar.name
            case other => refuse(
              s"UPDATE of a nested field (${other.sql}) — update the " +
                "top-level column, or use the API (updateWhere)")
          }
          name -> a.value
        }
        GraftUpdateCommand(t.root,
          cond.getOrElse(Literal.TrueLiteral), sets)

      case m: MergeIntoTable if m.resolved &&
          SnapshotV2.unapply(m.targetTable).isDefined =>
        planMerge(m)
    }
    afterDml.resolveOperatorsUp {
      case r: DataSourceV2Relation => r.table match {
        case t: SnapshotTable
            if t.exists && !t.canFileRelation && !t.readChangeFeed =>
          val served = graft.sources.SnapshotManifest
            .readVersion(spark, t.root, t.snapshotVersion.get)
            .queryExecution.analyzed
          // resolve BY NAME (names are unique in a table schema), never by
          // position: a column-order divergence between readVersion and
          // the relation must fail loudly, not serve data under the wrong
          // attribute. The lookup keys on lowercase, so two served names
          // differing only in case (legal under spark.sql.caseSensitive)
          // would silently collapse — fail loudly BEFORE building the map
          served.output.groupBy(_.name.toLowerCase).collectFirst {
            case (_, as) if as.size > 1 => throw new IllegalStateException(
              s"graft-snapshot: materialized serve of ${t.root} has " +
                s"case-colliding columns ${as.map(_.name).mkString(", ")} — " +
                "by-name resolution cannot disambiguate them; rename one")
          }
          val servedByName = served.output
            .map(a => a.name.toLowerCase -> a).toMap
          Project(r.output.map { tgt =>
            val src = servedByName.getOrElse(tgt.name.toLowerCase,
              throw new IllegalStateException(
                s"graft-snapshot: materialized serve of ${t.root} has no " +
                  s"column '${tgt.name}' (serves " +
                  s"${served.output.map(_.name).mkString(", ")})"))
            Alias(src, tgt.name)(exprId = tgt.exprId,
              qualifier = tgt.qualifier)
          }, served)
        case _ => r
      }
    }
  }

  /** Map a resolved MERGE onto the engine's verbs. Supported shapes (ON
    * must be an equality conjunction target.k = source.k):
    *
    *   - WHEN MATCHED THEN UPDATE SET … / WHEN NOT MATCHED THEN INSERT …
    *     with the SAME column→value mapping (the `SET * / INSERT *`
    *     upsert) → [[graft.operators.Upsert.mergeWhere]]
    *   - only WHEN MATCHED THEN DELETE →
    *     [[graft.operators.Upsert.deleteKeys]]
    *   - only WHEN NOT MATCHED THEN INSERT … → insert-if-absent
    *     (anti-join + merge)
    */
  private def planMerge(m: MergeIntoTable): LogicalPlan = {
    val (rel, t) = SnapshotV2.unapply(m.targetTable).get
    if (m.withSchemaEvolution)
      refuse("MERGE … WITH SCHEMA EVOLUTION — widen first (addColumns)")
    if (m.notMatchedBySourceActions.nonEmpty)
      refuse("WHEN NOT MATCHED BY SOURCE clauses")
    refuseSubquery(m.mergeCondition, "MERGE ON")

    val targetAttrs = rel.outputSet
    val sourceAttrs = m.sourceTable.outputSet

    // ON: equality conjunction pairing one target column with one source
    // column — the merge key
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val pkPairs: Seq[(String, Attribute)] = conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if targetAttrs.contains(a) && sourceAttrs.contains(b) => a.name -> b
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if targetAttrs.contains(a) && sourceAttrs.contains(b) => a.name -> b
      case other => refuse(
        s"MERGE ON clause `${other.sql}` — the ON condition must be a " +
          "conjunction of target.col = source.col equalities")
    }
    val pkNames = pkPairs.map(_._1)

    def assignPairs(assigns: Seq[Assignment], what: String): Seq[(String, Expression)] =
      assigns.map { a =>
        val name = a.key match {
          case ar: AttributeReference if targetAttrs.contains(ar) => ar.name
          case other => refuse(s"$what assignment to ${other.sql} — only " +
            "top-level target columns are assignable")
        }
        if (!a.value.references.subsetOf(sourceAttrs))
          refuse(s"$what assignment $name = ${a.value.sql} references " +
            "target columns — values must come from the source side")
        name -> a.value
      }

    def noCondition(c: Option[Expression], what: String): Unit =
      c.foreach(e => refuse(
        s"$what AND ${e.sql} — conditional merge clauses"))

    (m.matchedActions, m.notMatchedActions) match {
      // upsert: UPDATE SET … + INSERT …, same mapping (the SET*/INSERT* shape)
      case (Seq(UpdateAction(uc, upAssigns, _)), Seq(InsertAction(ic, inAssigns))) =>
        noCondition(uc, "WHEN MATCHED"); noCondition(ic, "WHEN NOT MATCHED")
        val up = assignPairs(upAssigns, "UPDATE")
        val in = assignPairs(inAssigns, "INSERT")
        val upMap = up.toMap
        val inMap = in.toMap
        // compare the NON-KEY mappings: the reference's canonical
        // explicit-list shape (utils.py:265-292) excludes the ON keys
        // from UPDATE SET (keys are immutable in a merge) while INSERT
        // includes them — a key column whose assignment just restates the
        // ON pair's source attribute is not a divergence; withKeyCols
        // fills missing keys from the ON pairs either way
        val pkMap = pkPairs.toMap
        def nonKey(m: Map[String, Expression]): Map[String, Expression] =
          m.filterNot { case (k, v) =>
            pkMap.get(k).exists(src => v.semanticEquals(src)) }
        val upCore = nonKey(upMap)
        val inCore = nonKey(inMap)
        if (upCore.keySet != inCore.keySet ||
            upCore.exists { case (k, v) => !inCore(k).semanticEquals(v) })
          refuse("UPDATE SET and INSERT with different column mappings — " +
            "the upsert needs one source→target mapping (use SET * / " +
            "INSERT *, or explicit lists that agree on every non-key " +
            "column; UPDATE SET may omit the ON key columns)")
        val staged = withKeyCols(up, pkPairs)
        GraftMergeCommand(t.root, m.sourceTable, staged.map {
          case (n, e) => (n, e) }, pkNames, insertOnly = false)

      // delete-matched
      case (Seq(DeleteAction(dc)), Seq()) =>
        noCondition(dc, "WHEN MATCHED")
        GraftMergeCommand(t.root, m.sourceTable,
          pkPairs.map { case (n, a) => (n, a: Expression) }, pkNames,
          insertOnly = false, deleteMatched = true)

      // insert-if-absent
      case (Seq(), Seq(InsertAction(ic, inAssigns))) =>
        noCondition(ic, "WHEN NOT MATCHED")
        val in = assignPairs(inAssigns, "INSERT")
        val staged = withKeyCols(in, pkPairs)
        GraftMergeCommand(t.root, m.sourceTable, staged, pkNames,
          insertOnly = true)

      case _ => refuse(
        "this MERGE clause combination. Supported: WHEN MATCHED THEN " +
          "UPDATE SET … + WHEN NOT MATCHED THEN INSERT … (one mapping); " +
          "WHEN MATCHED THEN DELETE alone; WHEN NOT MATCHED THEN INSERT " +
          "alone")
    }
  }

  /** The staged frame must carry the merge key; add the ON clause's
    * source columns for any key the assignments don't already set, and
    * refuse assignments that would CHANGE a key.
    */
  private def withKeyCols(assigns: Seq[(String, Expression)],
      pkPairs: Seq[(String, Attribute)]): Seq[(String, Expression)] = {
    val have = assigns.toMap
    pkPairs.foreach { case (name, src) =>
      have.get(name).foreach { e =>
        if (!e.semanticEquals(src)) refuse(
          s"assignment changes merge key $name (= ${e.sql}, ON uses " +
            s"${src.sql}) — keys are immutable in a merge")
      }
    }
    assigns ++ pkPairs.collect {
      case (name, src) if !have.contains(name) => name -> (src: Expression)
    }
  }
}

object SnapshotStatements {

  /** Unwraps alias chains to a snapshot-table V2 relation. */
  object SnapshotV2 {
    def unapply(plan: LogicalPlan): Option[(DataSourceV2Relation, SnapshotTable)] =
      plan match {
        case s: SubqueryAlias => unapply(s.child)
        case r: DataSourceV2Relation => r.table match {
          case t: SnapshotTable => Some((r, t))
          case _ => None
        }
        case _ => None
      }
  }

  def refuse(what: String): Nothing = throw new UnsupportedOperationException(
    s"graft-snapshot SQL does not support $what")

  def refuseSubquery(e: Expression, stmt: String): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      refuse(s"a subquery in the $stmt condition — materialize it and " +
        "use MERGE, or the API verbs")

  /** Detach a resolved single-relation expression from its attribute ids:
    * references become name-based so the verb re-resolves them against
    * its own fresh read of the table (names are unique in a table
    * schema, so this is sound). Applied at RUN time — the command node
    * stays fully resolved through CheckAnalysis.
    */
  def byName(e: Expression): Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  /** The stats columns the table's existing file stats cover — DML
    * rewrites re-record them so kept and rewritten lines keep their
    * pruning power.
    */
  def statsColsOf(spark: SparkSession, root: String): Seq[String] =
    SnapshotManifest.currentVersion(spark, root).toSeq.flatMap { v =>
      val (body, _) = SnapshotManifest.manifestParts(spark, root, v)
      SnapshotManifest.bodyStats(body).values.headOption
        .map(_.cols.keys.toSeq.sorted).getOrElse(Nil)
    }
}

/** `DELETE FROM <snapshot table> WHERE <cond>` → [[SnapshotManifest.deleteWhere]]
  * (stats-pruned copy-on-write, manifest-line reuse, loud conflicts).
  * The condition travels as SQL text (name-based), re-resolved by the
  * verb against its own read.
  */
final case class GraftDeleteCommand(root: String, cond: Expression)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotManifest.deleteWhere(spark, root,
      SnapshotStatements.byName(cond),
      SnapshotStatements.statsColsOf(spark, root))
    Nil
  }
}

/** `UPDATE <snapshot table> SET … WHERE …` → [[SnapshotManifest.updateWhere]]
  * (assignments evaluate against the pre-update row, SQL semantics).
  */
final case class GraftUpdateCommand(root: String, cond: Expression,
    sets: Seq[(String, Expression)]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotManifest.updateWhere(spark, root,
      SnapshotStatements.byName(cond),
      sets.map { case (c, e) => c -> SnapshotStatements.byName(e) }.toMap,
      SnapshotStatements.statsColsOf(spark, root))
    Nil
  }
}

/** `MERGE INTO <snapshot table>` → the engine's upsert family. The staged
  * frame is the resolved SOURCE plan projected through the merge's
  * column mapping (expressions keep their source attribute ids — the
  * plan they resolve against is carried verbatim); `deleteMatched` keys a
  * [[graft.operators.Upsert.deleteKeys]], `insertOnly` anti-joins the
  * current table first (pure insert-if-absent).
  */
final case class GraftMergeCommand(root: String, source: LogicalPlan,
    stagedCols: Seq[(String, Expression)], pkNames: Seq[String],
    insertOnly: Boolean, deleteMatched: Boolean = false)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val sourceDf = ColumnBridge.ofRows(spark, source)
    val staged = sourceDf.select(stagedCols.map { case (n, e) =>
      ColumnBridge.column(e).alias(n) }: _*)
    val statsCols = SnapshotStatements.statsColsOf(spark, root)
    if (deleteMatched) {
      graft.operators.Upsert.deleteKeys(spark, root,
        staged.select(pkNames.map(org.apache.spark.sql.functions.col): _*)
          .distinct(),
        pkNames, statsCols)
    } else if (insertOnly) {
      val current = SnapshotManifest.read(spark, root)
        .select(pkNames.map(org.apache.spark.sql.functions.col): _*)
      graft.operators.Upsert.mergeWhere(spark, root,
        staged.join(current, pkNames, "left_anti"), pkNames, statsCols)
    } else {
      graft.operators.Upsert.mergeWhere(spark, root, staged, pkNames,
        statsCols)
    }
    Nil
  }
}
