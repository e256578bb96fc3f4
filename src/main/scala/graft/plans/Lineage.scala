package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, ExprId}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Column-level lineage: walk a query's ANALYZED logical plan and emit,
  * for every output column, the set of source (table, column) pairs its
  * VALUE derives from — the governance surface a 100 TB curation
  * pipeline needs before it can answer "which raw fields fed this
  * training-set verdict?" (the reference's answer is reading dbt model
  * SQL by hand; here the analyzed plan is the single source of truth,
  * so lineage can never drift from what actually executes).
  *
  * Semantics:
  *  - DIRECT (value) lineage by default: filter/join predicates
  *    influence WHICH rows survive but not a surviving value, so they
  *    are not recorded. `includeIndirect = true` adds the ROW-SELECTION
  *    closure — every column referenced by a filter or join condition
  *    anywhere below — which is the set that can affect an output at
  *    all (e.g. a decontamination verdict built on `count(*)` over a
  *    shingle join has no direct column inputs, but indirectly depends
  *    on the joined text).
  *  - literal-derived columns (e.g. `count(*)`) have no DIRECT sources.
  *  - nodes that mint attributes this walker does not model map them
  *    CONSERVATIVELY to every source column their child plans expose —
  *    lineage may over-approximate but never silently drops a source.
  *
  * Pure driver-side plan introspection: no job runs, cost is O(plan).
  */
object Lineage {

  type Sources = Map[ExprId, Set[(String, String)]]

  /** (out_col, src_table, src_col) rows for every output column of
    * `df`, one row per contributing source column, ordered by name.
    */
  def describeLineage(df: DataFrame,
      includeIndirect: Boolean = false): DataFrame = {
    val plan = df.queryExecution.analyzed
    val (m, ctx) = walk(plan)
    val indirect = if (includeIndirect) ctx else Set.empty[(String, String)]
    val rows = plan.output.flatMap { a =>
      (m.getOrElse(a.exprId, Set.empty) ++ indirect).toSeq.sorted.map {
        case (t, c) => (a.name, t, c)
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF("out_col", "src_table", "src_col")
  }

  /** The lineage closure of one output column of `df`. */
  def sourcesOf(df: DataFrame, outCol: String,
      includeIndirect: Boolean = false): Set[(String, String)] = {
    val plan = df.queryExecution.analyzed
    val attr = plan.output.find(_.name == outCol).getOrElse(
      throw new IllegalArgumentException(
        s"'$outCol' is not an output column of the plan " +
          s"(${plan.output.map(_.name).mkString(", ")})"))
    val (m, ctx) = walk(plan)
    m.getOrElse(attr.exprId, Set.empty) ++
      (if (includeIndirect) ctx else Set.empty)
  }

  private def tableName(l: LogicalRelation): String =
    l.catalogTable.map(_.identifier.table).getOrElse(l.relation match {
      case h: HadoopFsRelation =>
        h.location.rootPaths.headOption
          .map(_.getName.stripSuffix(".parquet")).getOrElse("path")
      case r => r.getClass.getSimpleName
    })

  /** (direct-lineage map, row-selection context) for a subtree. The
    * context is the union of source columns referenced by any filter or
    * join condition in the subtree — the indirect closure.
    */
  private type WalkResult = (Sources, Set[(String, String)])

  /** Memoized by plan-node IDENTITY within one describeLineage call:
    * subquery plans are re-reachable from both the per-expression value
    * walk (refs) and the node's indirect-context walk (subCtx), and
    * without the memo each nesting level multiplies full re-walks —
    * super-linear driver work on nested subqueries. Identity (not
    * structural) keys: equal-but-distinct nodes are rare, while
    * structural hashing of a deep plan costs what the memo saves.
    */
  private def walk(plan: LogicalPlan,
      memo: java.util.IdentityHashMap[LogicalPlan, WalkResult] =
        new java.util.IdentityHashMap[LogicalPlan, WalkResult]())
      : WalkResult = {
    val cached = memo.get(plan)
    if (cached != null) return cached
    val result = walkUncached(plan, memo)
    memo.put(plan, result)
    result
  }

  private def walkUncached(plan: LogicalPlan,
      memo: java.util.IdentityHashMap[LogicalPlan, WalkResult])
      : WalkResult = {
    val childResults = plan.children.map(walk(_, memo))
    val childMaps = childResults.map(_._1)
    // UNION-merge across children, never last-wins: branches of one plan
    // can share exprIds (a localCheckpoint's LogicalRDD keeps the
    // attributes of the frame it snapshotted; DeduplicateRelations keeps
    // the first occurrence of a reused relation), and an opaque branch
    // mapping a shared id to {} must not clobber its sibling's real
    // sources
    val merged: Sources = childMaps.foldLeft(Map.empty[ExprId, Set[(String, String)]]) {
      (acc, m) =>
        m.foldLeft(acc) { case (a, (k, v)) =>
          a.updated(k, a.getOrElse(k, Set.empty) ++ v)
        }
    }
    // subquery expressions (scalar / EXISTS / IN) carry whole plans
    // inside an expression tree: their outputs' sources count as value
    // inputs of the referencing expression, and their internal
    // row-selection closure joins this node's indirect context
    def subqueryPlans(e: Expression): Seq[LogicalPlan] =
      e.collect { case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => s.plan }

    def refs(e: Expression): Set[(String, String)] = {
      val attrs = e.references.toSeq.flatMap(a => merged.get(a.exprId)).flatten.toSet
      val sub = subqueryPlans(e).flatMap { sp =>
        val (sm, _) = walk(sp, memo)
        sp.output.flatMap(a => sm.getOrElse(a.exprId, Set.empty[(String, String)]))
      }.toSet
      attrs ++ sub
    }

    val direct: Sources = plan match {
      case l: LogicalRelation =>
        val t = tableName(l)
        l.output.map(a => a.exprId -> Set(t -> a.name)).toMap
      case d: DataSourceV2Relation =>
        val t = d.identifier.map(_.name).getOrElse(d.table.name())
        d.output.map(a => a.exprId -> Set(t -> a.name)).toMap
      case _: LocalRelation | _: Range | _: OneRowRelation =>
        Map.empty // engine-generated rows: no external source
      case p: Project =>
        merged ++ p.projectList.map(ne => ne.exprId -> refs(ne))
      case a: Aggregate =>
        merged ++ a.aggregateExpressions.map(ne => ne.exprId -> refs(ne))
      case w: Window =>
        merged ++ w.windowExpressions.map(ne => ne.exprId -> refs(ne))
      case g: Generate =>
        merged ++ g.generatorOutput.map(a => a.exprId -> refs(g.generator))
      case e: Expand =>
        // rollup/cube/grouping-sets: output(i) is fed by projections(_)(i)
        merged ++ e.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> e.projections.map(p => refs(p(i)))
            .fold(Set.empty[(String, String)])(_ ++ _)
        }
      case u: Union =>
        // analyzed Union reuses the first child's exprIds; each output
        // position draws from that position of EVERY branch
        merged ++ u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> u.children.zip(childMaps).map { case (c, m) =>
            m.getOrElse(c.output(i).exprId, Set.empty[(String, String)])
          }.fold(Set.empty[(String, String)])(_ ++ _)
        }
      case p =>
        // pass-through nodes (Filter/Join/Sort/Limit/SubqueryAlias/...)
        // keep child exprIds; anything NEW that this walker does not
        // model maps conservatively to all child-exposed sources
        val unknown = p.output.filterNot(a => merged.contains(a.exprId))
        if (unknown.isEmpty) merged
        else {
          val all = childMaps.flatMap(_.values).flatten.toSet
          merged ++ unknown.map(_.exprId -> all)
        }
    }
    val ownConditions: Set[(String, String)] = plan match {
      case f: Filter => refs(f.condition)
      case j: Join => j.condition.map(refs).getOrElse(Set.empty)
      case _ => Set.empty
    }
    // every subquery anywhere in this node's expressions contributes its
    // own indirect closure (its internal filters/joins select rows too)
    val subCtx = plan.expressions.flatMap(subqueryPlans)
      .flatMap(sp => walk(sp, memo)._2).toSet
    (direct, childResults.flatMap(_._2).toSet ++ ownConditions ++ subCtx)
  }
}
