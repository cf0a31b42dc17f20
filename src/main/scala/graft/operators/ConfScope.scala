package graft.operators

import org.apache.spark.sql.SparkSession

/** Loop-scoped SQL-conf overrides, restored on exit — the save/set/
  * try/finally dance the iterative operators all need, written once
  * so the Some/None restore semantics cannot drift between copies.
  */
private[graft] object ConfScope {

  /** Runs `body` with
    * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true`
    * and restores the caller's setting afterwards (unset if it was
    * unset). Iterative operators set this so AQE can right-size the
    * stages that read their loop pins — without it the cached
    * fixed-width layout is frozen into every round's join and the
    * final materialization re-runs wide stages (the Graph.pageRank
    * finding).
    */
  def withCachedPlanRepartitioning[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
