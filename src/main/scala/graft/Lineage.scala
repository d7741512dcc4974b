package graft

import org.apache.spark.sql.DataFrame

/** Shared lineage plumbing for ITERATIVE operators (Components, KCore,
  * HyperBall, …): each round `localCheckpoint`s to truncate the
  * exponentially-referencing plan (the round-3 pointer-jumping lesson),
  * and the superseded round's materialized blocks are released here. */
object Lineage {

  /** Unpersist the materialized RDD blocks behind a localCheckpoint'd
    * Dataset (safe only once nothing will read it again — its lineage is
    * truncated, so the blocks cannot be recomputed). */
  def dropCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false)
      case _ => ()
    } catch { case _: Throwable => () }
}
