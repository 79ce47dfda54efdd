object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestBase.spark
    val name = args(0)
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val fin = plan.collect { case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan }
    (plan +: fin).foreach { p =>
      val s = p.toString
      println("=== scans=" + "documents\\.parquet".r.findAllIn(s).length + " reused=" + (s.contains("ReusedExchange") || s.contains("ReusedQueryStage")))
    }
  }
}
