package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality audit: one line per gate query with the physical-plan
  * features that matter at scale (exchanges, join strategies, scan
  * pushdown). Run per round; regressions here are perf bugs even when
  * correctness stays green. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(s: String) = s.r.findAllIn(plan).size
        val feats = Seq(
          "xchg" -> n("Exchange"),
          "bhj" -> n("BroadcastHashJoin"),
          "smj" -> n("SortMergeJoin"),
          "bnlj" -> n("BroadcastNestedLoopJoin"),
          "cart" -> n("CartesianProduct"),
          "scans" -> n("FileScan"),
          "pushed" -> n("PushedFilters: \\[[A-Z]"),
          "wscg" -> n("WholeStageCodegen"))
          .filter(_._2 > 0)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(f"PLAN $name%-26s $feats")
      } catch {
        case e: Exception => println(s"PLAN $name ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
