package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the engine needs: turning a custom
  * [[LogicalPlan]] node into a user-facing [[DataFrame]].
  *
  * Spark's public surface deliberately has no "DataFrame from logical
  * plan" constructor — `classic.Dataset.ofRows` is `private[sql]` — so
  * every library that ships its own relational operator (a logical node
  * planned by an injected strategy, the standard
  * `SparkSessionExtensions` route used for
  * [[graft.plans.AsOfJoinNode]]) hosts a one-line forwarder inside the
  * `org.apache.spark.sql` package. This file is that forwarder and
  * nothing else: no private state is touched, no behavior overridden;
  * the analyzed plan goes through the SAME `QueryExecution` pipeline
  * (analyzer → optimizer → planner → AQE) as any `spark.sql(...)` call.
  */
object GraftSqlShim {

  /** Wrap `plan` as a DataFrame on `spark`'s full query pipeline. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
