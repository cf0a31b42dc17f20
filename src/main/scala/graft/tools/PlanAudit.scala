package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Plan audit over every SparkEntry query: counts shuffles /
  * broadcast vs sort-merge joins / whole-stage-codegen coverage and
  * verifies parquet pushdown, so plan regressions are visible per
  * round. Run: `sbt "runMain graft.tools.PlanAudit [queryName]"`.
  * With a query name argument, prints that query's formatted plan.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args.nonEmpty) {
      SparkEntry.queries(args(0))(spark, dir).explain("formatted")
      spark.stop(); return
    }

    def collectPlan(p: SparkPlan): Seq[SparkPlan] = {
      val extra = p match {
        case a: AdaptiveSparkPlanExec => collectPlan(a.executedPlan)
        case _ => Nil
      }
      (p +: p.children.flatMap(collectPlan)) ++ extra
    }

    println(f"${"query"}%-16s ${"shuffles"}%9s ${"bcastJoin"}%10s ${"smj"}%5s ${"scans"}%6s  pushdown")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.executedPlan
        val nodes = collectPlan(plan)
        val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
        val bhj = nodes.count(_.isInstanceOf[BroadcastHashJoinExec])
        val smj = nodes.count(_.isInstanceOf[SortMergeJoinExec])
        val scans = nodes.count(_.nodeName.contains("Scan"))
        val simple = df.queryExecution.simpleString
        val pushed = if (simple.contains("PushedFilters: [")
          && !simple.contains("PushedFilters: []")) "yes" else "-"
        println(f"$name%-16s $shuffles%9d $bhj%10d $smj%5d $scans%6d  $pushed")
      } catch {
        case e: Exception => println(f"$name%-16s ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
