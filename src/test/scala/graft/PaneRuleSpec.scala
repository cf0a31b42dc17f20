package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, LogicalPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The auto-pane optimizer rule must produce byte-identical results
  * to the stock sliding-window plan, with the Expand moved ABOVE a
  * pane pre-aggregation (input aggregated once, partials replicated).
  */
class PaneRuleSpec extends AnyFunSuite with SparkSpec {

  private def withExtendedSession[A](f: SparkSession => A): A = {
    spark // force shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try f(SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions).getOrCreate())
    finally {
      SparkSession.setDefaultSession(SparkSpec.session)
      SparkSession.setActiveSession(SparkSpec.session)
    }
  }

  test("rule rewrites sliding-window agg to pane plan with equal results") {
    val baseline = operators.Windows
      .slidingAgg(Tables.events(spark, sf), "event_type", "ts", "value", 3600, 900)
      .collect().map(_.toString).sorted

    withExtendedSession { ext =>
      val df = operators.Windows
        .slidingAgg(Tables.events(ext, sf), "event_type", "ts", "value", 3600, 900)
      // structural check: an Aggregate must now sit BELOW the Expand
      def hasAggBelowExpand(p: LogicalPlan): Boolean = p.collect {
        case e: Expand if e.collectFirst { case a: Aggregate => a }.isDefined => e
      }.nonEmpty
      assert(hasAggBelowExpand(df.queryExecution.optimizedPlan),
        "pane rule did not fire:\n" + df.queryExecution.optimizedPlan.treeString)
      val got = df.collect().map(_.toString).sorted
      assert(got.sameElements(baseline))
    }
  }

  test("rule leaves tumbling windows and non-decomposable aggs alone") {
    withExtendedSession { ext =>
      val tumbling = Tables.events(ext, sf)
        .groupBy(col("user_id"), window(col("ts"), "1 hour"))
        .agg(sum("value"))
      assert(tumbling.count() > 0) // runs fine, no rewrite applicable
      val distinctAgg = Tables.events(ext, sf)
        .groupBy(col("event_type"), window(col("ts"), "1 hour", "15 minutes"))
        .agg(countDistinct(col("user_id")).as("u"))
      // must not be rewritten (distinct is not pane-decomposable) and
      // must still be correct
      def hasAggBelowExpand(p: LogicalPlan): Boolean = p.collect {
        case e: Expand if e.collectFirst { case a: Aggregate => a }.isDefined => e
      }.nonEmpty
      assert(!hasAggBelowExpand(distinctAgg.queryExecution.optimizedPlan))
      assert(distinctAgg.count() > 0)
    }
  }

  test("rule leaves offset-origin sliding windows alone, results stay correct") {
    withExtendedSession { ext =>
      val offset = Tables.events(ext, sf)
        .groupBy(col("event_type"),
          window(col("ts"), "1 hour", "15 minutes", "5 minutes"))
        .agg(sum(col("value")).as("s"))
      def hasAggBelowExpand(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
        p.collect {
          case e: Expand if e.collectFirst { case a: Aggregate => a }.isDefined => e
        }.nonEmpty
      assert(!hasAggBelowExpand(offset.queryExecution.optimizedPlan))
      assert(offset.count() > 0)
    }
  }

  test("rule also rewrites non-divisible size/slide (validity-filter form)") {
    val baseline = operators.Windows
      .slidingAgg(Tables.events(spark, sf), "event_type", "ts", "value", 3600, 1000)
      .collect().map(_.toString).sorted
    withExtendedSession { ext =>
      val df = operators.Windows
        .slidingAgg(Tables.events(ext, sf), "event_type", "ts", "value", 3600, 1000)
      def hasAggBelowExpand(p: LogicalPlan): Boolean = p.collect {
        case e: Expand if e.collectFirst { case a: Aggregate => a }.isDefined => e
      }.nonEmpty
      assert(hasAggBelowExpand(df.queryExecution.optimizedPlan),
        "pane rule did not fire on non-divisible shape")
      val got = df.collect().map(_.toString).sorted
      assert(got.sameElements(baseline))
    }
  }

  test("rule does not absorb user predicates on window fields") {
    withExtendedSession { ext =>
      // user filter on window.start: NOT the validity shape — must
      // stay unrewritten and correct
      val df = Tables.events(ext, sf)
        .groupBy(col("event_type"), window(col("ts"), "1 hour", "1000 seconds").as("w"))
        .agg(sum(col("value")).as("s"))
        .filter(col("w.start") > "2024-01-05")
      assert(df.count() > 0)
    }
  }
}
