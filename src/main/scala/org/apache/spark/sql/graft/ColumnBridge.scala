package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters — the one
  * place graft reaches into Spark's package namespace, so custom
  * Catalyst expressions can surface as `Column`s without requiring a
  * function-registry registration in every session.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Release the storage behind a `localCheckpoint()`ed DataFrame.
  * `Dataset.unpersist` only talks to the CacheManager, but checkpointing
  * persists the materialized RDD directly — the two never meet, so the
  * blocks stay pinned until the ContextCleaner happens to collect them.
  * This walks the plan to the LogicalRDD and unpersists its RDD.
  */
object CheckpointUtils {
  /** Unpersist the RDD behind `df` — ONLY if `df` IS the DataFrame a
    * `localCheckpoint()` returned (plan root is the LogicalRDD). A frame
    * that merely derives from a checkpoint keeps its upstream pinned:
    * releasing an ancestor whose lineage was truncated would break every
    * other frame still referencing it, so derived plans are a no-op here.
    */
  def release(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => () // derived plan: refuse to guess at an upstream RDD
    }
}
