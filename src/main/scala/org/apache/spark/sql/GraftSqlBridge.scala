package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Minimal bridge into the `private[sql]` Dataset constructor — the one
  * thing a library-defined operator (a custom [[LogicalPlan]] node planned
  * by an injected strategy, like [[graft.plans.AsOfJoinPlan]]) needs that
  * Spark does not expose publicly. Lives in `org.apache.spark.sql` for the
  * access scope only; contains no Spark-internal logic. */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
